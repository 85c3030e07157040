"""Training / testing entry point.

CLI parity with the reference's main.py (same flags: --config, --engine
{FE,OCIM,UE}, --local_rank/-r, --exp_id, --ds_config, --offline, --test) plus
--num_devices. One process drives all local accelerator devices (SPMD); for
multi-host runs launch one process per host and call
jax.distributed.initialize() via UNIDEFENSE_MULTIHOST=1.
"""

import os

from unidefense_tpu.config import arg_parser, load_config
from unidefense_tpu.engines import get_engine


def main():
    arg = arg_parser()
    import jax

    # Persistent compile cache (same location as bench.py / tools/*): the
    # flagship UDEB4 two-pass step takes ~4-6 min to compile on this runtime;
    # any repeat invocation (resume, --test after train, protocol sweeps)
    # hits the cache instead. UD_JAX_CACHE= (empty) disables.
    cache_dir = os.environ.get("UD_JAX_CACHE", "/tmp/ud_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    if os.environ.get("UNIDEFENSE_MULTIHOST"):
        jax.distributed.initialize()
    config = load_config(
        arg.config,
        engine=arg.engine,
        local_rank=arg.local_rank,
        exp_id=arg.exp_id,
        ds_config=arg.ds_config,
    )
    config["config"]["offline"] = arg.offline
    if arg.num_devices is not None:
        config["config"]["num_devices"] = arg.num_devices

    engine = get_engine(arg.engine)(config, stage="Test" if arg.test else "Train")
    if arg.test:
        engine.test()
    else:
        engine.train()


if __name__ == "__main__":
    main()
