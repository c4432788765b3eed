"""Extension test: registering a user-defined engine with its own sections
(the reference's emulators/tests/custom.py pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from cosmoprimo_tpu.cosmology import (BaseEngine, BaseSection, Cosmology, DefaultBackground,
                                      register_engine, register_section)


@register_section
class Background(DefaultBackground):
    pass


@register_section
class Thermodynamics(BaseSection):
    def __init__(self, engine):
        super().__init__(engine)
        # toy: rs_drag as a pure function of omega_m
        self._rs_drag = 147.0 * (0.1432 / engine['omega_m']) ** 0.25 * engine['h']

    @property
    def rs_drag(self):
        return self._rs_drag


@register_engine
class ToyEngine(BaseEngine):
    name = 'toy'


def test_custom_engine():
    cosmo = Cosmology(omega_cdm=0.12, omega_b=0.02237, h=0.6736, engine='toy')
    assert cosmo.engine.name == 'toy'
    ba = cosmo.get_background()
    chi = float(ba.comoving_radial_distance(1.0))
    assert np.isfinite(chi) and 2000 < chi < 2600
    rs = float(cosmo.get_thermodynamics().rs_drag)
    assert np.isfinite(rs) and 90 < rs < 110
    # custom engines trace too
    g = jax.grad(lambda oc: Cosmology(omega_cdm=oc, omega_b=0.02237, h=0.6736, engine='toy')
                 .get_thermodynamics().rs_drag)(0.12)
    assert np.isfinite(float(g)) and float(g) < 0
    # attribute forwarding finds unique section owner
    assert float(cosmo.rs_drag) == rs
