"""Native C++ async netCDF writer (native/mistra_io.cpp) round-trip."""

import numpy as np
import pytest

from mistra_tpu.io import netcdf as ncio

pytestmark = pytest.mark.skipif(not ncio.available(),
                                reason="native netCDF lib unavailable")


def test_roundtrip_async(tmp_path):
    path = str(tmp_path / "rt.nc")
    f = ncio.NcFile(path)
    f.def_dim("time", None)
    f.def_dim("n", 7)
    f.def_dim("m", 3)
    f.def_var("a", ("time", "m", "n"), units="K")
    f.def_var("t", ("time",), units="s")
    f.enddef()
    rng = np.random.default_rng(0)
    slabs = [rng.standard_normal((3, 7)) for _ in range(5)]
    for r, s in enumerate(slabs):
        f.put("a", s, record=r)          # async path
        f.put("t", np.float64(r), record=r)
    f.drain()
    f.close()

    r = ncio.NcReader(path)
    assert r.dimlen("time") == 5
    got = r.get("a", (5, 3, 7))
    np.testing.assert_allclose(got, np.stack(slabs))
    np.testing.assert_allclose(r.get("t", (5,)), np.arange(5.0))
    r.close()


def test_classic_format_magic(tmp_path):
    # files must stay readable by reference tooling (NCL reads CDF-2)
    path = str(tmp_path / "fmt.nc")
    f = ncio.NcFile(path)
    f.def_dim("n", 2)
    f.def_var("x", ("n",))
    f.enddef()
    f.put("x", np.array([1.0, 2.0]), async_=False)
    f.close()
    with open(path, "rb") as fh:
        magic = fh.read(4)
    assert magic[:3] == b"CDF"
