"""Data I/O: png / mat / NIfTI read & write (reference layer L7,
nsol/data_reader.py, nsol/data_writer.py — SimpleITK/pysitk replaced by
PIL, scipy.io, and a self-contained NIfTI-1 implementation)."""

from nsol_tpu.io.data_reader import DataReader
from nsol_tpu.io.data_writer import DataWriter
from nsol_tpu.io.nifti import NiftiImage, read_nifti, write_nifti

__all__ = ["DataReader", "DataWriter", "NiftiImage", "read_nifti",
           "write_nifti"]
