"""Drop-in alias for the reference's ``cosmoprimo.emulators.tools``
namespace (reference emulators/tools/__init__.py): downstream code imports
the engine/sampler classes from here. The implementations live in the flat
sibling modules (base/mlp/taylor/samples/operations)."""

from ..utils import setup_logging
from .base import EmulatedCalculator, Emulator, PointEmulatorEngine
from .mlp import MLPEmulatorEngine
from .operations import (ArcsinhOperation, ChebyshevOperation, Log10Operation, NormOperation,
                         Operation, PCAOperation, ScaleOperation)
from .samples import (CalculatorComputationError, DiffSampler, GridSampler, InputSampler,
                      QMCSampler, Samples)
from .taylor import TaylorEmulatorEngine

__all__ = ['Emulator', 'PointEmulatorEngine', 'EmulatedCalculator', 'Operation',
           'ScaleOperation', 'NormOperation', 'Log10Operation', 'ArcsinhOperation',
           'PCAOperation', 'ChebyshevOperation', 'TaylorEmulatorEngine',
           'MLPEmulatorEngine', 'Samples', 'InputSampler', 'GridSampler',
           'DiffSampler', 'QMCSampler', 'CalculatorComputationError', 'setup_logging']
