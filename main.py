"""Main entry point — mirrors the reference CLI (``/root/reference/main.py:11-24``):
``python main.py --config <name>`` builds a trainer, validates the config, trains.

The implementation lives in ``pl_convlstm_gan_tpu.cli`` (also installed as the
``pl-convlstm-gan-tpu`` console script — see pyproject.toml); this shim keeps the
reference-parity ``python main.py`` invocation working from a checkout."""
from pl_convlstm_gan_tpu.cli import main

if __name__ == "__main__":
    main()
