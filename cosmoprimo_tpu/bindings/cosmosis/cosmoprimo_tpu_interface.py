"""cosmosis module interface: setup/execute writing background distances,
linear P(k) and Cls into the datablock (reference parity:
bindings/cosmosis/cosmoprimo_interface.py).

Requires ``cosmosis`` (optional).
"""

import numpy as np


def setup(options):
    from cosmoprimo_tpu import Cosmology
    try:
        from cosmosis.datablock import option_section
        engine = options.get_string(option_section, 'engine', default='eisenstein_hu')
        zmax = options.get_double(option_section, 'zmax', default=4.0)
        nz = options.get_int(option_section, 'nz', default=150)
        kmax = options.get_double(option_section, 'kmax', default=10.0)
        nk = options.get_int(option_section, 'nk', default=200)
        want_cls = options.get_bool(option_section, 'cmb_cl', default=False)
    except ImportError:
        engine, zmax, nz, kmax, nk, want_cls = 'eisenstein_hu', 4.0, 150, 10.0, 200, False
    return {'engine': engine, 'z': np.linspace(0.0, zmax, nz),
            'k': np.geomspace(1e-4, kmax, nk), 'want_cls': want_cls,
            'base': Cosmology(engine=engine)}


def get_inputs(block):
    from cosmosis.datablock import names
    cp = names.cosmological_parameters
    params = {}
    for cos_name, our_name in [('h0', 'h'), ('omega_b', 'Omega_b'), ('omega_c', 'Omega_cdm'),
                               ('omega_k', 'Omega_k'), ('n_s', 'n_s'), ('a_s', 'A_s'),
                               ('sigma_8', 'sigma8'), ('tau', 'tau_reio'), ('mnu', 'm_ncdm'),
                               ('w', 'w0_fld'), ('wa', 'wa_fld')]:
        if block.has_value(cp, cos_name):
            params[our_name] = block[cp, cos_name]
    return params


def execute(block, config):
    from cosmosis.datablock import names
    from cosmoprimo_tpu import CosmologyError

    try:
        cosmo = config['base'].clone(**get_inputs(block))
    except CosmologyError as exc:
        block.log_error(f'cosmology error: {exc}')
        return 1

    z = config['z']
    k = config['k']
    h = float(np.asarray(cosmo['h']))
    ba = cosmo.get_background()

    dist = names.distances
    block[dist, 'z'] = z
    block[dist, 'a'] = 1.0 / (1.0 + z)
    block[dist, 'd_c'] = np.asarray(ba.comoving_radial_distance(z)) / h
    block[dist, 'd_a'] = np.asarray(ba.angular_diameter_distance(z)) / h
    block[dist, 'd_l'] = np.asarray(ba.luminosity_distance(z)) / h
    block[dist, 'd_m'] = np.asarray(ba.comoving_transverse_distance(z)) / h
    block[dist, 'h'] = np.asarray(ba.hubble_function(z)) / (299792.458)
    block[dist, 'age'] = float(np.asarray(ba.age))

    gr = names.growth_parameters
    block[gr, 'z'] = z
    block[gr, 'd_z'] = np.asarray(ba.growth_factor(z))
    block[gr, 'f_z'] = np.asarray(ba.growth_rate(z))

    pk = cosmo.get_fourier().pk_interpolator()
    pkz = np.asarray(pk(k, z))  # (nk, nz), (Mpc/h)^3
    mp = names.matter_power_lin
    block.put_grid(mp, 'z', z, 'k_h', k, 'p_k', pkz.T)

    cp = names.cosmological_parameters
    block[cp, 'sigma_8'] = float(np.asarray(pk.sigma8_z(0.0)))

    if config['want_cls']:
        cls = cosmo.get_harmonic().lensed_cl()
        ell = np.asarray(cls['ell'])
        cmb = names.cmb_cl
        block[cmb, 'ell'] = ell
        for name in ['tt', 'ee', 'bb', 'te']:
            if name in cls:
                block[cmb, name] = np.asarray(cls[name])
    return 0


def cleanup(config):
    return 0
