"""Worker for the real 2-process multi-host test (spawned by
test_multihost.py). Renders a tiny scene through the distributed driver
and dumps (film, b) for the parent to compare across processes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start;
# force CPU through both the env var and jax.config
os.environ['JAX_PLATFORMS'] = 'cpu'


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    out_dir = sys.argv[4]

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from langevin_mcmc_tpu.parallel import multihost
    multihost.init_distributed(coordinator=coord, num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np
    from langevin_mcmc_tpu.scene.parse import parse_scene

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'data')
    scene, opts, _ = parse_scene(os.path.join(data, 'lcbox.xml'),
                                 film_wh=(16, 16))
    opts = opts.replace(max_depth=3, mala=False, h2mc=False,
                        num_chains=32, num_init_samples=512,
                        direct_spp=0, large_step_probability=0.3,
                        use_light_coordinate_sampling=False)
    film, b = multihost.render_mlt_multihost(
        scene, opts, jax.random.PRNGKey(7), num_steps=4, chunk=256)
    np.savez(os.path.join(out_dir, f'proc{pid}.npz'),
             film=np.asarray(film), b=np.float64(b))


if __name__ == '__main__':
    main()
