"""Pure-numpy classic NetCDF codec (sources/netcdf3.py): byte-level
round trips against the public CDF format grammar, the record-layout
special cases, and the FULL Spark S1→K8 path on real .nc bytes —
write_netcdf_grid → files on disk → read_wrf_grid — with no injected
stubs (the container-default codec path)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.sources.netcdf3 import (
    NetCDF3Reader,
    NetCDF3Writer,
)


def _roundtrip(build):
    """Write via NetCDF3Writer into a temp path, reread the bytes."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.nc")
        w = NetCDF3Writer(p)
        build(w)
        w.close()
        content = open(p, "rb").read()
    return content, NetCDF3Reader(content)


def test_fixed_vars_attrs_and_magic():
    def build(w):
        w.createDimension("y", 2)
        w.createDimension("x", 3)
        v = w.createVariable("grid", "f8", ("y", "x"))
        v[:] = np.arange(6, dtype="f8").reshape(2, 3)
        v.units = "mm"
        t = w.createVariable("tag", "i4", ("y",))
        t[:] = np.array([7, -9], dtype="i4")

    content, ds = _roundtrip(build)
    assert content[:4] == b"CDF\x02"
    assert ds.dimensions == {"y": 2, "x": 3}
    assert ds.variables["grid"].shape == (2, 3)
    assert ds.variables["grid"].units == "mm"
    np.testing.assert_array_equal(
        ds.variables["grid"][:], np.arange(6).reshape(2, 3)
    )
    np.testing.assert_array_equal(ds.variables["tag"][:], [7, -9])


def test_record_vars_interleaved_and_numrecs():
    def build(w):
        w.createDimension("Time", None)  # unlimited → record layout
        w.createDimension("y", 2)
        a = w.createVariable("a", "f8", ("Time", "y"))
        a[:] = np.arange(6, dtype="f8").reshape(3, 2)
        b = w.createVariable("b", "i4", ("Time",))
        b[:] = np.array([10, 20, 30], dtype="i4")
        c = w.createVariable("fixed", "f4", ("y",))
        c[:] = np.array([1.5, 2.5], dtype="f4")

    content, ds = _roundtrip(build)
    assert struct.unpack(">I", content[4:8])[0] == 3  # numrecs
    assert ds.variables["a"].shape == (3, 2)
    np.testing.assert_array_equal(
        ds.variables["a"][:], np.arange(6).reshape(3, 2)
    )
    np.testing.assert_array_equal(ds.variables["b"][:], [10, 20, 30])
    np.testing.assert_array_equal(ds.variables["fixed"][:], [1.5, 2.5])
    # slicing hits the record path, not just full loads
    np.testing.assert_array_equal(ds.variables["a"][1:3, 0], [2.0, 4.0])


def test_single_record_var_unpadded_special_case():
    """The spec drops 4-byte record padding when exactly ONE record
    variable exists: three i2 records then occupy 6 contiguous bytes,
    which a padded reader would mis-stride."""

    def build(w):
        w.createDimension("t", None)
        v = w.createVariable("v", "i2", ("t",))
        v[:] = np.array([1, 2, 3], dtype="i2")

    content, ds = _roundtrip(build)
    np.testing.assert_array_equal(ds.variables["v"][:], [1, 2, 3])
    # record section is exactly 3×2 bytes at the tail
    assert content[-6:] == struct.pack(">3h", 1, 2, 3)


def test_fill_value_masks_and_i8_range_check():
    def build(w):
        w.createDimension("y", 3)
        v = w.createVariable("v", "f8", ("y",), fill_value=float("nan"))
        v[:] = np.array([1.0, np.nan, 3.0])
        t = w.createVariable("mins", "i8", ("y",))
        t[:] = np.array([0, 15, 30], dtype="i8")  # NC_INT downcast

    _, ds = _roundtrip(build)
    got = ds.variables["v"][:]
    assert np.ma.is_masked(got[1]) and not np.ma.is_masked(got[0])
    np.testing.assert_array_equal(
        np.ma.filled(got, -1.0), [1.0, -1.0, 3.0]
    )
    np.testing.assert_array_equal(ds.variables["mins"][:], [0, 15, 30])
    # out-of-range i8 refuses loudly instead of wrapping
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        w = NetCDF3Writer(os.path.join(d, "bad.nc"))
        w.createDimension("y", 1)
        v = w.createVariable("v", "i8", ("y",))
        v[:] = np.array([2**40], dtype="i8")
        with pytest.raises(ValueError, match="NC_INT range"):
            w.close()


def test_cdf1_header_with_4_byte_offsets():
    """Hand-built CDF-1 bytes (version byte 1 → 4-byte begin): one
    fixed f4 variable, per the published grammar."""
    out = bytearray(b"CDF\x01")
    out += struct.pack(">I", 0)          # numrecs
    out += struct.pack(">II", 0x0A, 1)   # dim list, 1 dim
    out += struct.pack(">I", 1) + b"y\x00\x00\x00"  # name "y" padded
    out += struct.pack(">I", 2)          # size 2
    out += struct.pack(">II", 0, 0)      # no global attrs
    out += struct.pack(">II", 0x0B, 1)   # var list, 1 var
    out += struct.pack(">I", 1) + b"v\x00\x00\x00"
    out += struct.pack(">I", 1) + struct.pack(">I", 0)  # rank 1, dimid 0
    out += struct.pack(">II", 0, 0)      # no var attrs
    out += struct.pack(">II", 5, 8)      # NC_FLOAT, vsize 8
    begin = len(out) + 4                 # 4-byte begin field (CDF-1)
    out += struct.pack(">I", begin)
    out += struct.pack(">2f", 1.5, -2.5)
    ds = NetCDF3Reader(bytes(out))
    np.testing.assert_array_equal(ds.variables["v"][:], [1.5, -2.5])


def test_hdf5_and_garbage_magic_rejected():
    with pytest.raises(ValueError, match="HDF5"):
        NetCDF3Reader(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a classic"):
        NetCDF3Reader(b"PK\x03\x04junk")


def test_spark_roundtrip_real_nc_bytes_no_stubs(spark, tmp_path):
    """S1+S2+K8 on REAL bytes, default codecs end to end: the long
    grid → write_netcdf_grid (pure CDF-2 writer) → .nc files on disk →
    binaryFile scan + read_wrf_grid (pure classic reader) → the same
    long grid.  This is the exact plan the reference's daily cron
    drives (wrf_data_pusher.py:143-279), minus nothing."""
    from curw_wrf_data_pusher_spark.sources.netcdf import (
        read_wrf_grid,
        write_netcdf_grid,
    )
    from .wrf_fixture import make_grid_pdf

    pdf = make_grid_pdf()
    grid = (
        spark.createDataFrame(pdf)
        .withColumn("source_file", F.lit("d03_RAINNC.nc"))
        .withColumn(
            "fgt_utc", F.lit("2024-06-02 03:17:00").cast("timestamp")
        )
        .withColumn("epoch_str", F.lit("2024-06-01 00:00:00"))
    )
    out_dir = str(tmp_path / "wrfA")
    manifest = write_netcdf_grid(grid, out_dir).toPandas()
    assert len(manifest) == len(pdf[["wrf_system"]].drop_duplicates())

    back = read_wrf_grid(
        spark, str(tmp_path),
        bbox={"lat_min": -90, "lat_max": 90,
              "lon_min": -180, "lon_max": 180},
    ).toPandas()
    want = pdf.copy()
    # the writer names files {system}_{basename}_{variable}.nc (all
    # under out_dir), so the original system label is the filename
    # prefix; read_wrf_grid's dir-derived wrf_system ("wrfA" here) is
    # irrelevant to the value round trip
    key = ["wrf_system", "t_idx", "y", "x"]
    got = back.copy()
    got["wrf_system"] = got["source_file"].map(
        lambda p: p.rsplit("/", 1)[-1].split("_")[0]
    )
    assert set(got["wrf_system"]) == set(want["wrf_system"])
    g = got.set_index(key).sort_index()
    w = want.set_index(key).sort_index()
    assert len(g) == len(w)
    np.testing.assert_allclose(
        g["rainnc_cum"].to_numpy(), w["rainnc_cum"].to_numpy()
    )
    np.testing.assert_allclose(
        g["latitude"].to_numpy(), w["latitude"].to_numpy()
    )
    np.testing.assert_allclose(
        g["longitude"].to_numpy(), w["longitude"].to_numpy()
    )
    np.testing.assert_array_equal(
        g["xtime_min"].to_numpy(), w["xtime_min"].to_numpy()
    )
    assert (g["epoch_str"] == "2024-06-01 00:00:00").all()


from hypothesis import given, settings, strategies as st


@st.composite
def _nc_payload(draw):
    n_rec = draw(st.integers(0, 4))
    n_y = draw(st.integers(1, 5))
    n_x = draw(st.integers(1, 4))
    dtypes = draw(
        st.lists(
            st.sampled_from(["i1", "i2", "i4", "f4", "f8"]),
            min_size=1, max_size=4,
        )
    )
    vars_ = []
    for i, dt in enumerate(dtypes):
        is_rec = draw(st.booleans())
        shape = (n_rec, n_y) if is_rec else (n_y, n_x)
        if dt.startswith("i"):
            bits = int(dt[1]) * 8 - 1
            vals = draw(
                st.lists(
                    st.integers(-(2**bits) + 1, 2**bits - 1),
                    min_size=int(np.prod(shape)),
                    max_size=int(np.prod(shape)),
                )
            )
            arr = np.array(vals, dtype=dt).reshape(shape)
        else:
            vals = draw(
                st.lists(
                    st.floats(
                        allow_nan=False, allow_infinity=False,
                        width=32 if dt == "f4" else 64,
                    ),
                    min_size=int(np.prod(shape)),
                    max_size=int(np.prod(shape)),
                )
            )
            arr = np.array(vals, dtype=dt).reshape(shape)
        vars_.append((f"v{i}", dt, is_rec, arr))
    return n_rec, n_y, n_x, vars_


@settings(max_examples=25, deadline=None)
@given(_nc_payload())
def test_roundtrip_property_any_shape_dtype_mix(payload):
    """Any mix of fixed/record variables across all five classic
    dtypes round-trips bit-exactly (record interleaving, padding,
    single-record-var special case included by construction)."""
    n_rec, n_y, n_x, vars_ = payload

    def build(w):
        w.createDimension("t", None)
        w.createDimension("y", n_y)
        w.createDimension("x", n_x)
        for name, dt, is_rec, arr in vars_:
            v = w.createVariable(
                name, dt, ("t", "y") if is_rec else ("y", "x")
            )
            v[:] = arr

    _, ds = _roundtrip(build)
    for name, dt, is_rec, arr in vars_:
        got = ds.variables[name][:]
        assert got.dtype == np.dtype(dt)
        np.testing.assert_array_equal(got, arr)


def test_cdf5_header_wide_sizes_and_int64():
    """Hand-built CDF-5 bytes (version 5 → 8-byte NON_NEG sizes,
    NC_INT64 type) per the published 64-bit-data grammar: one fixed
    i8 variable of two elements."""
    out = bytearray(b"CDF\x05")
    out += struct.pack(">Q", 0)          # numrecs (8-byte)
    out += struct.pack(">I", 0x0A) + struct.pack(">Q", 1)  # dim list
    out += struct.pack(">Q", 1) + b"y\x00\x00\x00"  # name len 8-byte
    out += struct.pack(">Q", 2)          # dim size (8-byte)
    out += struct.pack(">I", 0) + struct.pack(">Q", 0)  # no gattrs
    out += struct.pack(">I", 0x0B) + struct.pack(">Q", 1)  # var list
    out += struct.pack(">Q", 1) + b"v\x00\x00\x00"
    out += struct.pack(">Q", 1)          # rank (8-byte)
    out += struct.pack(">Q", 0)          # dimid (8-byte NON_NEG in CDF-5)
    out += struct.pack(">I", 0) + struct.pack(">Q", 0)  # no vattrs
    out += struct.pack(">I", 10)         # NC_INT64
    out += struct.pack(">Q", 16)         # vsize (8-byte)
    begin = len(out) + 8
    out += struct.pack(">Q", begin)      # begin (8-byte)
    out += struct.pack(">2q", 2**40, -7)
    ds = NetCDF3Reader(bytes(out))
    got = ds.variables["v"][:]
    assert got.dtype == np.dtype("i8")
    np.testing.assert_array_equal(got, [2**40, -7])


def test_int64_attribute_out_of_range_refuses():
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        # on an f8 variable, a large int attr is lossless as f8 and
        # is stored var-typed (NC_DOUBLE) — no error, no wrap
        w = NetCDF3Writer(os.path.join(d, "a.nc"))
        w.createDimension("y", 1)
        v = w.createVariable("v", "f8", ("y",))
        v[:] = np.array([1.0])
        v.big = 2**40
        w.close()
        ds = NetCDF3Reader(open(os.path.join(d, "a.nc"), "rb").read())
        assert ds.variables["v"]._attrs["big"].dtype.str.lstrip("<>=") == "f8"
        assert int(ds.variables["v"]._attrs["big"]) == 2**40
        # on an i4 variable the same value has NO lossless classic
        # type at all → refuse loudly instead of wrapping
        w = NetCDF3Writer(os.path.join(d, "b.nc"))
        w.createDimension("y", 1)
        v = w.createVariable("v", "i4", ("y",))
        v[:] = np.array([1], dtype="i4")
        v.big = 2**40  # int attr beyond NC_INT
        with pytest.raises(ValueError, match="NC_INT range"):
            w.close()


def test_var_attr_written_in_variables_own_type():
    """_FillValue (and any lossless numeric var attr) must be stored
    with the VARIABLE's nc_type, not promoted to f8/i4 — the classic
    _FillValue convention; strict netCDF-C readers ignore a promoted
    fill.  f4 and i2 variables exercise both numeric kinds; a lossy
    value (int too big for i2) falls back to the promoted type."""
    content, ds = _roundtrip(
        lambda w: _build_attr_vars(w)
    )
    # reader surfaces dtypes straight from the stored atype
    assert ds.variables["small"]._attrs["_FillValue"].dtype.str.lstrip("<>=") == "f4"
    assert ds.variables["codes"]._attrs["_FillValue"].dtype.str.lstrip("<>=") == "i2"
    assert ds.variables["codes"]._attrs["too_big"].dtype.str.lstrip("<>=") == "i4"
    np.testing.assert_allclose(
        float(ds.variables["small"]._attrs["_FillValue"]), -9.5
    )
    assert int(ds.variables["codes"]._attrs["_FillValue"]) == -1
    assert int(ds.variables["codes"]._attrs["too_big"]) == 2**20


def _build_attr_vars(w):
    w.createDimension("y", 2)
    v = w.createVariable("small", "f4", ("y",), fill_value=-9.5)
    v[:] = np.array([1.0, 2.0], dtype="f4")
    c = w.createVariable("codes", "i2", ("y",), fill_value=-1)
    c.too_big = 2**20  # does not fit i2 → promoted NC_INT fallback
    c[:] = np.array([3, 4], dtype="i2")
