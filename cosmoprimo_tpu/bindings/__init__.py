"""Adapters exposing the framework to external inference frameworks
(cobaya, cosmosis). Imports are gated: the external packages are optional."""
