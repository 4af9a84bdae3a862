import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (bench runs use the real chip). The axon
# sitecustomize pins JAX_PLATFORMS=axon, so override via jax.config too.
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

from langevin_mcmc_tpu.utils.compilecache import enable as _enable_cache  # noqa: E402
_enable_cache()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: heavy integration test (XLA compile minutes on '
        'CPU); skipped unless RUN_SLOW=1')


def pytest_collection_modifyitems(config, items):
    if os.environ.get('RUN_SLOW'):
        return
    skip = pytest.mark.skip(reason='slow integration test; set RUN_SLOW=1')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Cap in-process XLA CPU memory: the long-lived suite otherwise
    accumulates ~30 GB of compiled executables/LLVM state and the CPU
    compiler eventually segfaults (observed twice around the 90% mark)."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()


TORUS_XML = '/root/reference/scenes/torus/lmc.xml'
TORUS_H2MC_XML = '/root/reference/scenes/torus/h2mc.xml'
VEACHDOOR_XML = '/root/reference/scenes/veachdoor/lmc.xml'


@pytest.fixture(scope='session')
def torus_scene():
    from langevin_mcmc_tpu.scene.parse import parse_scene
    return parse_scene(TORUS_XML)
