#!/usr/bin/env python
# Entry-point shim (mirrors the reference's repo-root nsol_run_denoising.py).
from nsol_tpu.cli.run_denoising import main

if __name__ == "__main__":
    main()
