#!/usr/bin/env python
# Entry-point shim (mirrors the reference's repo-root nsol_corrupt_data.py).
from nsol_tpu.cli.corrupt_data import main

if __name__ == "__main__":
    main()
