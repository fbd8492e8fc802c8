#!/usr/bin/env python
# Entry-point shim (mirrors the reference's repo-root nsol_show_parameter_study.py).
from nsol_tpu.cli.show_parameter_study import main

if __name__ == "__main__":
    main()
