"""Run a federated training job from a JSON config.

Thin wrapper over the package CLI (`python -m flashe_tpu submit`), the
analogue of the reference's
`fate_flow_client.py -f submit_job -d DSL -c CONF`:

    python examples/run_sim.py examples/configs/cnn_flashe_q16_b1_pad.json
    python examples/run_sim.py examples/configs/mlp_flashe.json --processes
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    from flashe_tpu.__main__ import main as cli_main

    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    config, extra = args[0], args[1:]
    return cli_main(["submit", "-c", config] + extra)


if __name__ == "__main__":
    sys.exit(main())
