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
    if os.environ.get("UNIDEFENSE_MULTIHOST"):
        import jax

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
