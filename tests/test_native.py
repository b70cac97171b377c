"""Native C++ NIfTI decoder: parity with the pure-Python parser.

Covers the host-runtime native component (SURVEY.md §7 names host-side
NIfTI ingest as the one place native C++ is warranted). Skips cleanly when
no toolchain is available — every caller has a Python fallback.
"""

import os

import numpy as np
import pytest

from hsenet_tpu.data.nifti import read_nifti, write_nifti

native = pytest.importorskip("hsenet_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++/zlib toolchain unavailable"
)


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("dtype", [np.int16, np.float32, np.uint16])
def test_native_matches_python_reader(tmp_path, gz, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(-900, 900, (7, 9, 11)).astype(dtype)
    else:
        data = rng.standard_normal((7, 9, 11)).astype(dtype)
    path = str(tmp_path / ("v.nii.gz" if gz else "v.nii"))
    write_nifti(path, data, spacing=(0.7, 0.8, 1.5), scl_slope=2.0,
                scl_inter=-3.0)

    py = read_nifti(path, native="never")
    nat = read_nifti(path, native="require")
    np.testing.assert_allclose(
        nat.zyx_data.astype(np.float32), py.zyx_data.astype(np.float32)
    )
    assert nat.scl_slope == py.scl_slope == 2.0
    assert nat.scl_inter == py.scl_inter == -3.0
    np.testing.assert_allclose(nat.zyx_spacing, py.zyx_spacing, rtol=1e-6)


def test_native_probe_and_apply_scl(tmp_path):
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    path = str(tmp_path / "p.nii.gz")
    write_nifti(path, data, spacing=(1.0, 2.0, 3.0), scl_slope=0.5,
                scl_inter=10.0)
    shape, spacing, slope, inter = native.probe(path)
    assert shape == (4, 3, 2)  # zyx
    assert spacing == (3.0, 2.0, 1.0)
    assert (slope, inter) == (0.5, 10.0)

    raw, _, _, _ = native.decode(path, apply_scl=False)
    scl, _, s, i = native.decode(path, apply_scl=True)
    assert (s, i) == (1.0, 0.0)
    np.testing.assert_allclose(scl, raw * 0.5 + 10.0)


def test_native_batch_decode(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    vols = []
    for j in range(5):
        d = rng.integers(-500, 500, (4, 6, 8)).astype(np.int16)
        p = str(tmp_path / f"b{j}.nii.gz")
        write_nifti(p, d)
        paths.append(p)
        vols.append(d)
    out = native.decode_batch(paths, shape=(8, 6, 4), num_threads=3)
    assert out.shape == (5, 8, 6, 4)
    for j, d in enumerate(vols):
        ref = read_nifti(paths[j], native="never").zyx_data
        np.testing.assert_allclose(out[j], ref.astype(np.float32))


def test_native_error_paths(tmp_path):
    bad = str(tmp_path / "bad.nii")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 100)
    with pytest.raises(ValueError):
        native.decode(bad)
    with pytest.raises(ValueError):
        native.probe(str(tmp_path / "missing.nii"))
