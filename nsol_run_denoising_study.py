#!/usr/bin/env python
# Entry-point shim (mirrors the reference's repo-root nsol_run_denoising_study.py).
from nsol_tpu.cli.run_denoising_study import main

if __name__ == "__main__":
    main()
