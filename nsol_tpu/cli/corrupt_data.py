"""Tool to smooth data and add noise to it (test-data generator).

Parity port of nsol/application/corrupt_data.py:30-91: optional Gaussian
blur then gaussian/poisson/uniform/salt&pepper noise with seed=1.
"""

import numpy as np
import jax.numpy as jnp

from nsol_tpu.cli.argparser import InputArgparser
from nsol_tpu.io import DataReader, DataWriter
from nsol_tpu.noise import Noise
from nsol_tpu.ops import conv as C


def main():
    input_parser = InputArgparser(
        description="Tool to smooth data and add noise to it")
    input_parser.add_filename(required=True)
    input_parser.add_result(required=True)
    input_parser.add_noise(default="gaussian")
    input_parser.add_noise_level(default=0.05)
    input_parser.add_blur(default=[1])
    args = input_parser.parse_args()
    input_parser.print_arguments(args)

    data_reader = DataReader(args.filename)
    data_reader.read_data()
    nda = data_reader.get_data()

    blur = np.atleast_1d(args.blur).astype(np.float64)
    if blur[0] > 0:
        if blur.size == 1:
            cov = np.diag(np.ones(nda.ndim)) * blur ** 2
        elif blur.size == nda.ndim:
            cov = np.diag(blur ** 2)
        else:
            raise IOError(
                "Blur information must be either 1- or d-dimensional")
        A, _ = C.make_blur_operators(cov, alpha_cut=3, shape=nda.shape,
                                     method="fft")
        nda = np.asarray(A(jnp.asarray(nda)))

    noise = Noise(nda, seed=1)
    if args.noise == "gaussian":
        noise.add_gaussian_noise(noise_level=args.noise_level, sigma=1)
    elif args.noise == "poisson":
        noise.add_poisson_noise(noise_level=args.noise_level, lmbda=1)
    elif args.noise == "uniform":
        noise.add_uniform_noise(noise_level=args.noise_level)
    elif args.noise in ("s&p", "salt_and_pepper"):
        noise.add_salt_and_pepper_noise(salt_vs_pepper=0.5, amount=0.1)
    elif args.noise in (None, "none", "None"):
        pass
    else:
        raise IOError("Noise type '%s' not known" % args.noise)

    DataWriter(noise.get_noisy_data(), args.result,
               data_reader.get_image_nifti()).write_data()
    return 0


if __name__ == "__main__":
    main()
