"""CLI applications (reference layer L8): the six entry points
nsol_run_denoising, nsol_run_deconvolution, nsol_run_denoising_study,
nsol_run_deconvolution_study, nsol_show_parameter_study, nsol_corrupt_data
(reference: nsol/application/*.py + setup.py:60-69)."""

import os


def setup_compile_cache():
    """Enable jax's persistent compilation cache for CLI runs.

    The axon remote compiler costs seconds-to-minutes per program
    (BASELINE.md timing notes); bench/suite always enable the on-disk
    cache and the CLIs should too — repeated study/deconvolution
    invocations of the same configuration then start warm.
    ``NSOL_TPU_COMPILE_CACHE`` overrides the location (empty string
    disables)."""
    loc = os.environ.get("NSOL_TPU_COMPILE_CACHE")
    if loc == "":
        return
    if loc is None:
        loc = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is an optimization, never a hard failure
        pass
