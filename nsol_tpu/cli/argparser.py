"""Declarative CLI argument collection.

Same flag surface as the reference's InputArgparser
(nsol/input_argparser.py:34-415): one ``add_<flag>()`` method per known
option, defaults auto-appended to help text, ``print_arguments`` echo.
Implemented directly on argparse without the locals()-introspection
machinery.
"""

import argparse

from nsol_tpu import timer as ph
from nsol_tpu.__about__ import __version__
from nsol_tpu.defaults import (
    ALLOWED_INPUT_EXTENSIONS, ALLOWED_NOISE_TYPES,
)
from nsol_tpu.ops.losses import LOSSES
from nsol_tpu.ops.measures import SIMILARITY_MEASURES

__all__ = ["InputArgparser"]

INPUT_FILE_TYPES = "(" + ", ".join(ALLOWED_INPUT_EXTENSIONS) + ")"
NOISE_TYPES = "(" + ", ".join(ALLOWED_NOISE_TYPES) + ", or none)"


class InputArgparser(object):

    def __init__(self, description=None, prog=None,
                 epilog="nsol_tpu version: %s" % __version__):
        kwargs = {}
        if description is not None:
            kwargs["description"] = description
        if prog is not None:
            kwargs["prog"] = prog
        if epilog is not None:
            kwargs["epilog"] = epilog
        self._parser = argparse.ArgumentParser(**kwargs)
        self._parser.add_argument(
            "--version", action="version", version="%s" % __version__,
            help="Show version number and exit")

    def get_parser(self):
        return self._parser

    def parse_args(self, args=None):
        return self._parser.parse_args(args)

    def print_arguments(self, args, title="Input Parameters:"):
        ph.print_title(title)
        for arg in sorted(vars(args)):
            ph.print_info("%s: " % arg, newline=False)
            print(getattr(args, arg))

    def _add(self, option_string, **kwargs):
        default = kwargs.get("default")
        required = kwargs.get("required", False)
        if default is not None and not required and "help" in kwargs:
            kwargs["help"] += " [default: %s]" % str(default)
        self._parser.add_argument(option_string, **kwargs)

    # -- file arguments ----------------------------------------------------

    def add_observation(self, required=True):
        self._add("--observation", type=str, required=required,
                  help="Path to observation %s." % INPUT_FILE_TYPES)

    def add_filename(self, required=True):
        self._add("--filename", type=str, required=required,
                  help="Path to filename %s." % INPUT_FILE_TYPES)

    def add_dir_input(self, default=None, required=False):
        self._add("--dir-input", type=str, default=default,
                  required=required, help="Input directory.")

    def add_result(self, required=True, default=None):
        self._add("--result", type=str, required=required, default=default,
                  help="Specify path for obtained result %s."
                       % INPUT_FILE_TYPES)

    def add_reference(self, required=False):
        self._add("--reference", type=str, required=required,
                  help="Path to reference %s. Similarity measures are "
                       "computed only if reference is given."
                       % INPUT_FILE_TYPES)

    def add_dir_output(self, default=None, required=False):
        self._add("--dir-output", type=str, default=default,
                  required=required, help="Output directory.")

    def add_dir_output_figures(self, default=None):
        self._add("--dir-output-figures", type=str, default=default,
                  help="If given, created figures are saved to this "
                       "directory.")

    # -- problem configuration ---------------------------------------------

    def add_reconstruction_type(self, default="TVL1"):
        self._add("--reconstruction-type", type=str, default=default,
                  help="Define reconstruction type. Allowed values are "
                       "'TVL1', 'TVL2', 'HuberL1' and 'HuberL2' (denoising) "
                       "or 'TK0L2', 'TK1L2', 'TVL2', 'HuberL2' "
                       "(deconvolution).")

    def add_measures(self, default=None):
        self._add("--measures", type=str, nargs="+", default=default,
                  help="Measures to be evaluated between reference (if "
                       "given) and reconstruction (%s)."
                       % ", ".join(SIMILARITY_MEASURES))

    def add_alpha(self, default=0.03):
        self._add("--alpha", type=float, nargs="+", default=default,
                  help="Regularization parameter alpha to solve the "
                       "minimization problem min_x [f(x) + alpha g(x)].")

    def add_alpha_range(self, default=None, required=False):
        self._add("--alpha-range", type=float, nargs="+", default=default,
                  required=required,
                  help="Specify regularization parameter array by providing "
                       "'First Last Step' information; generated via "
                       "np.linspace(First, Last, Step).")

    def add_data_loss(self, default="linear"):
        self._add("--data-loss", type=str, default=default,
                  help="Loss function rho used for the data term "
                       "(%s)." % ", ".join(LOSSES))

    def add_data_losses(self, default=None, required=False):
        self._add("--data-losses", nargs="+", default=default,
                  required=required,
                  help="Specify data losses to be used (%s)."
                       % ", ".join(LOSSES))

    def add_data_loss_scale(self, default=1):
        self._add("--data-loss-scale", type=float, default=default,
                  help="Value of soft margin between inlier and outlier "
                       "residuals; rho_(f2) = C**2 * rho(f2/C**2).")

    def add_data_loss_scale_range(self, default=None, required=False):
        self._add("--data-loss-scale-range", type=float, nargs="+",
                  default=default, required=required,
                  help="Specify data loss scales by 'First Last Step'; "
                       "generated via np.linspace.")

    def add_blur(self, default=0):
        self._add("--blur", type=float, nargs="+", default=default,
                  help="Specify for Gaussian blurring a single standard "
                       "deviation (isotropic) or one per spatial direction "
                       "(elliptic).")

    def add_noise(self, default=None):
        self._add("--noise", type=str, default=default,
                  help="Specify type of noise to be applied %s."
                       % NOISE_TYPES)

    def add_noise_level(self, default=None):
        self._add("--noise-level", type=float, default=default,
                  help="Specify noise level to be applied.")

    # -- solver configuration ----------------------------------------------

    def add_solver(self, default="PD"):
        self._add("--solver", type=str, default=default,
                  help="Type of solver: 'ADMM' or 'PD'.")

    def add_minimizer(self, default="lsmr"):
        self._add("--minimizer", type=str, default=default,
                  help="Minimizer for the inner quadratic problem: 'lsmr' "
                       "(CGLS on TPU), 'cg' (CG on fused normal equations "
                       "— fastest for linear loss), 'lsq_linear', "
                       "'least_squares', or a quasi-Newton name like "
                       "'L-BFGS-B' (required for non-linear data losses).")

    def add_rho(self, default=0.5):
        self._add("--rho", type=float, default=default,
                  help="Regularization parameter of the augmented "
                       "Lagrangian term for TV regularization by ADMM.")

    def add_iterations(self, default=10):
        self._add("--iterations", type=int, default=default,
                  help="Number of ADMM/Primal-Dual iterations.")

    def add_iter_max(self, default=10):
        self._add("--iter-max", type=int, default=default,
                  help="Number of maximum iterations for the inner solver.")

    def add_pd_alg_type(self, default="ALG2"):
        self._add("-pd_alg_type", type=str, default=default,
                  help="Step-size schedule of the primal-dual algorithm: "
                       "'ALG2', 'ALG2_AHMOD' or 'ALG3' (Chambolle 2011).")

    def add_tv_solver(self, default="PD"):
        self._add("--tv-solver", type=str, default=default,
                  help="Solver for TV problems: 'PD' or 'ADMM'.")

    # -- misc ---------------------------------------------------------------

    def add_study_name(self, default=None, required=False):
        self._add("--study-name", type=str, default=default,
                  required=required,
                  help="Name of parameter study without white spaces.")

    def add_colormap(self, default=None):
        self._add("--colormap", type=str, default=default,
                  help="Colormap for visualization (2D), e.g. 'Greys_r'.")

    def add_verbose(self, default=1):
        self._add("--verbose", type=int, default=default,
                  help="Turn on/off verbose output.")

    def add_option(self, option_string="--option", nargs=None, type=float,
                   default=None, required=False, help="Add option."):
        self._add(option_string, nargs=nargs, type=type, default=default,
                  required=required, help=help)
