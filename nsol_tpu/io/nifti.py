"""Minimal self-contained NIfTI-1 reader/writer.

The reference reads/writes nii via SimpleITK (nsol/data_reader.py:63-66,
nsol/data_writer.py:65-71); neither SimpleITK nor nibabel is available here,
so this implements the NIfTI-1 container directly (348-byte header + raw
voxels, optional gzip). Array convention matches
``sitk.GetArrayFromImage``: arrays are (z, y, x) index order while header
``pixdim``/spacing stay in (x, y, z) spatial order — the same pairing the
rest of the library assumes (see nsol_tpu/ops/kernels.py).
"""

import gzip
import struct

import numpy as np

__all__ = ["NiftiImage", "read_nifti", "write_nifti"]

_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
    64: np.float64, 256: np.int8, 512: np.uint16, 768: np.uint32,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


class NiftiImage(object):
    """Voxel data in (z, y, x) order plus the spatial metadata needed for
    round-tripping (spacing in (x, y, z), affine rows, codes)."""

    def __init__(self, data, spacing=None, affine=None,
                 qform_code=0, sform_code=1):
        self.data = np.asarray(data)
        ndim = self.data.ndim
        self.spacing = (np.ones(ndim) if spacing is None
                        else np.asarray(spacing, dtype=np.float64))
        if affine is None:
            affine = np.eye(4)
            for i in range(min(3, ndim)):
                affine[i, i] = self.spacing[i]
        self.affine = np.asarray(affine, dtype=np.float64)
        self.qform_code = qform_code
        self.sform_code = sform_code

    def get_spacing(self):
        """Spacing in (x, y, z) order — SimpleITK GetSpacing() parity."""
        return tuple(self.spacing)

    def get_origin(self):
        """World coordinates of voxel (0,0,0) — SimpleITK GetOrigin()
        parity (the affine's translation column)."""
        return tuple(self.affine[:3, 3])

    def get_direction(self):
        """Row-major 9-tuple of direction cosines — SimpleITK
        GetDirection() parity (the affine's rotation columns, normalized
        by spacing)."""
        ndim = min(3, self.data.ndim)
        cols = np.array(self.affine[:3, :3], dtype=np.float64)
        for i in range(ndim):
            s = self.spacing[i] if i < len(self.spacing) else 1.0
            if s:
                cols[:, i] = cols[:, i] / s
        return tuple(cols.reshape(-1))


def _maybe_gzip_read(path):
    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"\x1f\x8b":
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def read_nifti(path):
    """Parse a .nii / .nii.gz file into a :class:`NiftiImage`."""
    raw = _maybe_gzip_read(path)
    if len(raw) < 352:
        raise IOError("Not a NIfTI-1 file: %s" % path)
    sizeof_hdr = struct.unpack("<i", raw[:4])[0]
    if sizeof_hdr != 348:
        raise IOError("Unsupported NIfTI header size %d in %s"
                      % (sizeof_hdr, path))
    magic = raw[344:348]
    if magic not in (b"n+1\x00", b"ni1\x00"):
        raise IOError("Bad NIfTI magic %r in %s" % (magic, path))

    dim = struct.unpack("<8h", raw[40:56])
    ndim = dim[0]
    shape_xyz = dim[1:1 + ndim]
    datatype = struct.unpack("<h", raw[70:72])[0]
    if datatype not in _DTYPES:
        raise IOError("Unsupported NIfTI datatype %d" % datatype)
    dtype = np.dtype(_DTYPES[datatype]).newbyteorder("<")
    pixdim = struct.unpack("<8f", raw[76:108])
    vox_offset = int(struct.unpack("<f", raw[108:112])[0])
    scl_slope, scl_inter = struct.unpack("<2f", raw[112:120])
    qform_code, sform_code = struct.unpack("<2h", raw[252:256])
    srow = np.array(struct.unpack("<12f", raw[280:328]),
                    dtype=np.float64).reshape(3, 4)

    count = int(np.prod(shape_xyz))
    data = np.frombuffer(raw, dtype=dtype, count=count, offset=vox_offset)
    # NIfTI voxels are Fortran-ordered (x fastest); reshape then reverse axes
    # to get the (z, y, x) array convention.
    data = data.reshape(shape_xyz, order="F").transpose(
        tuple(range(ndim - 1, -1, -1)))
    if scl_slope not in (0.0, 1.0):
        data = data * scl_slope + scl_inter

    affine = np.eye(4)
    affine[:3, :] = srow
    spacing = np.asarray(pixdim[1:1 + ndim], dtype=np.float64)
    return NiftiImage(np.ascontiguousarray(data), spacing=spacing,
                      affine=affine, qform_code=qform_code,
                      sform_code=sform_code)


def write_nifti(data, path, like=None, spacing=None):
    """Write a (z, y, x)-ordered array to .nii / .nii.gz.

    ``like``: optional :class:`NiftiImage` whose spatial metadata is copied
    (the reference's CopyInformation pattern, nsol/data_writer.py:65-71).
    """
    data = np.asarray(data)
    if data.dtype not in _CODES:
        data = data.astype(np.float64)
    ndim = data.ndim

    if like is not None:
        spacing = like.spacing
        affine = like.affine
        qform_code, sform_code = like.qform_code, like.sform_code
    else:
        spacing = (np.ones(ndim) if spacing is None
                   else np.asarray(spacing, dtype=np.float64))
        affine = np.eye(4)
        for i in range(min(3, ndim)):
            affine[i, i] = spacing[i]
        qform_code, sform_code = 0, 1

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    dim = [ndim] + list(data.shape[::-1]) + [1] * (7 - ndim)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, _CODES[np.dtype(data.dtype)])
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)
    pixdim = [1.0] + [float(s) for s in np.atleast_1d(spacing)[:ndim]] \
        + [1.0] * (7 - ndim)
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)      # vox_offset
    struct.pack_into("<2f", hdr, 112, 1.0, 0.0)  # scl_slope/inter
    struct.pack_into("<2h", hdr, 252, qform_code, sform_code)
    struct.pack_into("<12f", hdr, 280,
                     *np.asarray(affine, dtype=np.float64)[:3, :].reshape(-1))
    struct.pack_into("<4s", hdr, 344, b"n+1\x00")

    # Data back to Fortran order (x fastest).
    payload = data.transpose(tuple(range(ndim - 1, -1, -1))).tobytes(
        order="F")
    blob = bytes(hdr) + b"\x00" * 4 + payload

    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(blob)
    else:
        with open(path, "wb") as f:
            f.write(blob)
