"""Best-effort interactive 3-D viewing.

The reference hands 3-D reconstructions to the ITK-Snap viewer with
spatial metadata (/root/reference/nsol/application/show_parameter_study.py:279-313
via sitkh.show_sitk_image; /root/reference/nsol/application/run_denoising.py:197-248).
This environment bundles neither SimpleITK nor a GUI, so the CLIs default
to headless orthogonal-slice galleries — but when an ``itksnap``
executable or ``napari`` is available, :func:`try_interactive_3d` opens
the reconstructions in it (same semantics: all volumes loaded together,
the first as the main image, optional mask as segmentation, voxel
spacing applied). Returns False when no viewer is available so callers
fall back to the headless path.
"""

import os
import shutil
import subprocess
import tempfile

import numpy as np

__all__ = ["try_interactive_3d"]


def try_interactive_3d(volumes, labels, spacing=None, segmentation=None,
                       block=False):
    """Open 3-D ``volumes`` (list of (z, y, x) arrays) interactively.

    Tries the ``itksnap`` executable first (volumes written as temporary
    NIfTI files: first volume ``-g``, the rest ``-o``, ``segmentation``
    as ``-s`` — the reference viewer's contract), then ``napari``.
    ``spacing`` is (x, y, z) voxel spacing. Returns True when a viewer
    was launched."""
    spacing = (np.ones(3) if spacing is None
               else np.asarray(spacing, dtype=np.float64))

    exe = shutil.which("itksnap")
    if exe:
        from nsol_tpu.io.nifti import write_nifti

        tmpdir = tempfile.mkdtemp(prefix="nsol_tpu_view_")
        paths = []
        for vol, lab in zip(volumes, labels):
            safe = "".join(c if c.isalnum() else "_" for c in str(lab))
            p = os.path.join(tmpdir, safe + ".nii.gz")
            write_nifti(np.asarray(vol, dtype=np.float32), p,
                        spacing=spacing)
            paths.append(p)
        cmd = [exe, "-g", paths[0]]
        if len(paths) > 1:
            cmd += ["-o"] + paths[1:]
        if segmentation is not None:
            seg_path = os.path.join(tmpdir, "segmentation.nii.gz")
            write_nifti(np.asarray(segmentation, dtype=np.float32),
                        seg_path, spacing=spacing)
            cmd += ["-s", seg_path]
        proc = subprocess.Popen(cmd)
        if block:
            proc.wait()
        return True

    try:
        import napari
    except ImportError:
        return False
    viewer = napari.Viewer()
    # napari's scale is in array (z, y, x) order
    scale = spacing[::-1]
    for vol, lab in zip(volumes, labels):
        viewer.add_image(np.asarray(vol), name=str(lab), scale=scale)
    if segmentation is not None:
        viewer.add_labels(np.asarray(segmentation).astype(np.int32),
                          name="mask", scale=scale)
    napari.run()
    return True
