import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (bench runs use the real chip). The axon
# sitecustomize pins JAX_PLATFORMS=axon, so override via jax.config too.
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402

TORUS_XML = '/root/reference/scenes/torus/lmc.xml'
TORUS_H2MC_XML = '/root/reference/scenes/torus/h2mc.xml'
VEACHDOOR_XML = '/root/reference/scenes/veachdoor/lmc.xml'


@pytest.fixture(scope='session')
def torus_scene():
    from langevin_mcmc_tpu.scene.parse import parse_scene
    return parse_scene(TORUS_XML)
