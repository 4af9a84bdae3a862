"""CLI: render Mitsuba-style scene XMLs.

Counterpart of the reference driver (src/main.cpp:35-120):
  dpt [options] scene.xml ...   ->   python -m langevin_mcmc_tpu scene.xml

Per scene, dispatches on the <dpt> integrator: "mc" -> plain path tracing
(PathTrace), "mcmc" -> MLT with the configured mutation kernel. No
--compile-pathlib flags exist: jax.jit traces and caches the path functions
at first use (the chad codegen+gcc+dlopen pipeline, main.cpp:66-88, is
replaced by the XLA compilation cache).
"""

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        prog='langevin_mcmc_tpu',
        description='TPU-native gradient-based MCMC renderer')
    p.add_argument('scenes', nargs='+', help='scene XML files')
    p.add_argument('--seedoffset', type=int, default=0,
                   help='RNG seed offset (main.cpp:57-59)')
    p.add_argument('--max-derivatives-depth', type=int, default=8,
                   help='max path depth for derivative kernels (unused: '
                        'jax.grad handles any depth; kept for CLI parity)')
    p.add_argument('--film-scale', type=float, default=1.0,
                   help='scale film resolution (debugging)')
    p.add_argument('--spp', type=int, default=None, help='override spp')
    p.add_argument('--chunk', type=int, default=8192,
                   help='wavefront size per jit step')
    p.add_argument('--output-dir', default='.', help='output directory')
    p.add_argument('--mesh', action='store_true',
                   help='shard chains over all local devices (device mesh)')
    p.add_argument('--coordinator', default=None,
                   help='multi-host coordinator address host:port')
    p.add_argument('--num-processes', type=int, default=None,
                   help='multi-host process count')
    p.add_argument('--process-id', type=int, default=None,
                   help='this process id (multi-host)')
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import numpy as np

    from .parallel.multihost import init_distributed
    distributed = init_distributed(args.coordinator, args.num_processes,
                                   args.process_id)

    from .utils.compilecache import enable as enable_cache
    enable_cache()

    from .scene.parse import parse_scene
    from .integrators.pathtrace import render_mc
    from .integrators.mlt import render_mlt
    from .utils import image_io

    for scene_file in args.scenes:
        if not os.path.exists(scene_file):
            print(f'error: scene file not found: {scene_file}',
                  file=sys.stderr)
            sys.exit(1)
        print(f'parsing {scene_file}')
        film_wh = None
        if args.film_scale != 1.0:
            import xml.etree.ElementTree as ET
            # peek at film size
            root = ET.parse(scene_file).getroot()
            w = h = 512
            for node in root.iter():
                if node.get('name') == 'width':
                    w = int(node.get('value'))
                elif node.get('name') == 'height':
                    h = int(node.get('value'))
            film_wh = (int(w * args.film_scale), int(h * args.film_scale))
        scene, opts, output_name = parse_scene(scene_file, film_wh=film_wh)
        opts = opts.replace(seed_offset=args.seedoffset)
        if args.spp is not None:
            opts = opts.replace(spp=args.spp)
        key = jax.random.PRNGKey(opts.seed_offset)

        t0 = time.time()
        if opts.integrator == 'mc':
            film = render_mc(scene, opts, key, chunk=args.chunk)
            b = None
        elif distributed or args.mesh:
            from .parallel.multihost import render_mlt_multihost
            film, b = render_mlt_multihost(scene, opts, key,
                                           chunk=args.chunk, progress=True)
        else:
            film, b = render_mlt(
                scene, opts, key, chunk=args.chunk, progress=True,
                intermediate_path=os.path.join(args.output_dir,
                                               'intermediate'))
        film = np.asarray(jax.block_until_ready(film))
        elapsed = time.time() - t0
        if b is not None:
            print(f'Average brightness:{b}')
        print(f'Elapsed time:{elapsed}')

        base = os.path.join(args.output_dir, output_name)
        hdr = f'{base}_timeuse_{elapsed:.6f}s.exr'
        ldr = f'{base}_timeuse_{elapsed:.6f}s.png'
        image_io.write_image(hdr, film)
        image_io.write_image(ldr, film)   # filmic tonemap (mlt.cpp:211-212)
        print(f'wrote {hdr}')
        print('Done!')


if __name__ == '__main__':
    main()
