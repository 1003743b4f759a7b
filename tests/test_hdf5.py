"""Pure-numpy HDF5 codec (sources/hdf5.py): byte-level round trips
against the public HDF5 File Format Specification, the new-style
(superblock v2 / OHDR v2 / compact-link) structures netCDF-4 emits,
and the FULL Spark S1 path on real HDF5-backed .nc bytes — NC4Writer
→ files on disk → read_wrf_grid — with no injected stubs."""

from __future__ import annotations

import os
import struct
import tempfile
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.sources.hdf5 import (
    HDF5Reader,
    HDF5Writer,
    NC4Writer,
)

_UNDEF8 = (1 << 64) - 1


def _roundtrip(build):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.h5")
        w = HDF5Writer(p)
        build(w)
        w.close()
        content = open(p, "rb").read()
    return content, HDF5Reader(content)


def test_contiguous_datasets_attrs_and_magic():
    a = np.arange(24, dtype="f8").reshape(2, 3, 4)
    t = np.array([0, 60], dtype="i4")

    def build(w):
        w.create_dataset("grid", a, attrs={"units": "mm", "scale": 2.5})
        w.create_dataset("mins", t, attrs={"description": "minutes"})

    content, ds = _roundtrip(build)
    assert content[:8] == b"\x89HDF\r\n\x1a\n"
    assert ds.variables["grid"].shape == (2, 3, 4)
    assert ds.variables["grid"].units == "mm"
    assert float(ds.variables["grid"].scale) == 2.5
    np.testing.assert_array_equal(ds.variables["grid"][:], a)
    np.testing.assert_array_equal(ds.variables["mins"][:], t)
    # numpy-style partial slicing (the WRF axis reads)
    np.testing.assert_array_equal(ds.variables["grid"][0, :, 0], a[0, :, 0])
    np.testing.assert_array_equal(ds.variables["grid"][0, 0, :], a[0, 0, :])


def test_chunked_gzip_shuffle_with_edge_overhang():
    """Chunk grid (2,3,4) over shape (3,5,7): edge chunks overhang in
    every dimension and must be clipped on read; shuffle+deflate run
    in reverse order on read."""
    rng = np.arange(105, dtype="f4").reshape(3, 5, 7) * 1.5

    def build(w):
        w.create_dataset("v", rng, chunks=(2, 3, 4), gzip=6, shuffle=True)

    _, ds = _roundtrip(build)
    got = ds.variables["v"][:]
    assert got.dtype.str.lstrip("<>=") == "f4"
    np.testing.assert_array_equal(got, rng)


def test_chunked_without_filters_and_int_dtypes():
    a = np.arange(12, dtype="i2").reshape(3, 4)

    def build(w):
        w.create_dataset("v", a, chunks=(2, 2))
        w.create_dataset("u", np.array([1, 2], dtype="u8"))

    _, ds = _roundtrip(build)
    np.testing.assert_array_equal(ds.variables["v"][:], a)
    np.testing.assert_array_equal(ds.variables["u"][:], [1, 2])


def test_fill_value_attr_masks_floats():
    a = np.array([1.0, -999.0, 3.0])

    def build(w):
        w.create_dataset("v", a, attrs={"_FillValue": -999.0})

    _, ds = _roundtrip(build)
    got = ds.variables["v"][:]
    assert np.ma.is_masked(got[1]) and not np.ma.is_masked(got[0])


def test_dimension_scales_populate_dimensions():
    def build(w):
        w.create_dataset(
            "time", np.arange(5, dtype="f8"),
            attrs={"CLASS": "DIMENSION_SCALE", "NAME": "time"},
        )
        w.create_dataset("v", np.arange(5, dtype="f8"))

    _, ds = _roundtrip(build)
    assert ds.dimensions == {"time": 5}


def test_garbage_magic_rejected():
    with pytest.raises(ValueError, match="not an HDF5"):
        HDF5Reader(b"CDF\x01" + b"\x00" * 64)


def test_btree_deeper_than_one_raises_clearly():
    """Dense link storage is supported for name-index B-trees of
    depth ≤ 1 (thousands of links); a deeper tree must raise a clear
    scoped error, not desync."""
    out = bytearray(b"\x00" * 48)
    # BTHD with depth 2 — the reader must refuse before touching the
    # (garbage) fractal heap
    btree = len(out)
    b = bytearray(b"BTHD") + struct.pack("<BB", 0, 5)
    b += struct.pack("<IH", 512, 11) + struct.pack("<H", 2)
    b += struct.pack("<BB", 85, 40) + struct.pack("<Q", 4096)
    b += struct.pack("<H", 1) + struct.pack("<Q", 99)
    b += struct.pack("<I", 0)
    out += b
    root = len(out)
    li = struct.pack("<BB", 0, 0) + struct.pack("<Q", 4096)
    li += struct.pack("<Q", btree)
    msg = struct.pack("<BHB", 0x02, len(li), 0) + li
    hdr = b"OHDR" + struct.pack("<BBB", 2, 0, len(msg) + 4)
    out += hdr + msg + struct.pack("<I", 0)
    sb = bytearray(b"\x89HDF\r\n\x1a\n")
    sb += struct.pack("<BBBB", 2, 8, 8, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF8, len(out), root)
    sb += struct.pack("<I", 0)
    assert len(sb) == 48
    out[:48] = sb
    with pytest.raises(ValueError, match="deeper than 1"):
        HDF5Reader(bytes(out))


def _v2_msg(mtype: int, body: bytes) -> bytes:
    return struct.pack("<BHB", mtype, len(body), 0) + body


def _ohdr_v2(messages) -> bytes:
    chunk0 = b"".join(_v2_msg(t, b) for t, b in messages)
    n = len(chunk0) + 4  # + checksum
    if n < 256:
        return (b"OHDR" + struct.pack("<BBB", 2, 0, n) + chunk0
                + struct.pack("<I", 0))
    return (b"OHDR" + struct.pack("<BBH", 2, 1, n) + chunk0
            + struct.pack("<I", 0))


def test_superblock_v2_ohdr_v2_compact_links():
    """Hand-built bytes per the spec's 1.8+ grammar — superblock v2,
    OHDR v2 headers, dataspace v2, attribute v3, layout v3, links as
    compact LINK messages (the structure netCDF-4's link-creation-
    order tracking produces for few-variable files)."""
    vals = np.array([[1.5, -2.5, 4.0], [0.0, 7.25, -1.0]], dtype="<f8")
    out = bytearray(b"\x00" * 48)
    data_addr = len(out)
    out += vals.tobytes()

    # dataset OHDR v2
    dspace = struct.pack("<BBBB", 2, 2, 0, 1) + struct.pack("<QQ", 2, 3)
    dtype = struct.pack("<B3sI", 0x11, bytes([0x20, 63, 0]), 8)
    dtype += struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    layout = (struct.pack("<BB", 3, 1)
              + struct.pack("<QQ", data_addr, vals.nbytes))
    units = b"mm\x00"
    attr_dt = struct.pack("<B3sI", 0x13, b"\x00\x00\x00", len(units))
    attr_ds = struct.pack("<BBBB", 2, 0, 0, 0)  # scalar, v2, rank 0
    attr = struct.pack("<BBHHHB", 3, 0, 6, len(attr_dt), len(attr_ds), 0)
    attr += b"units\x00" + attr_dt + attr_ds + units
    dset_addr = len(out)
    out += _ohdr_v2([
        (0x01, dspace), (0x03, dtype), (0x08, layout), (0x0C, attr),
    ])

    # root group OHDR v2 with one compact hard link "v"
    link = struct.pack("<BB", 1, 0x04)          # version, creation order
    link += struct.pack("<Q", 0)                # creation order value
    link += struct.pack("<B", 1) + b"v"         # 1-byte name length
    link += struct.pack("<Q", dset_addr)        # object header address
    root_addr = len(out)
    out += _ohdr_v2([(0x06, link)])

    sb = bytearray(b"\x89HDF\r\n\x1a\n")
    sb += struct.pack("<BBBB", 2, 8, 8, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF8, len(out), root_addr)
    sb += struct.pack("<I", 0)
    assert len(sb) == 48
    out[:48] = sb

    ds = HDF5Reader(bytes(out))
    assert list(ds.variables) == ["v"]
    assert ds.variables["v"].units == "mm"
    np.testing.assert_array_equal(ds.variables["v"][:], vals)


def test_big_endian_data():
    """Big-endian datatype decodes correctly."""
    a = np.array([3.5, -1.25], dtype=">f8")

    def build(w):
        w.create_dataset("be", a)

    _, ds = _roundtrip(build)
    got = ds.variables["be"][:]
    np.testing.assert_array_equal(got.astype("f8"), a.astype("f8"))


def test_nc4_writer_spark_roundtrip_real_nc4_bytes(spark, tmp_path):
    """S1 on REAL HDF5 bytes, default codecs end to end: the long
    grid → write_netcdf_grid(create_dataset=create_nc4) → HDF5 .nc
    files on disk → binaryFile scan + read_wrf_grid (pure HDF5
    reader) → the same long grid.  The HDF5 twin of
    test_netcdf3.test_spark_roundtrip_real_nc_bytes_no_stubs
    (reference: wrf_data_pusher.py:143-279 via the netCDF4 C lib)."""
    from curw_wrf_data_pusher_spark.sources.hdf5 import create_nc4
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
    out_dir = str(tmp_path / "wrfH")
    manifest = write_netcdf_grid(
        grid, out_dir, create_dataset=create_nc4
    ).toPandas()
    assert len(manifest) == len(pdf[["wrf_system"]].drop_duplicates())
    # the files on disk really are HDF5
    fnames = [f for f in os.listdir(out_dir) if f.endswith(".nc")]
    assert fnames
    for f in fnames:
        with open(os.path.join(out_dir, f), "rb") as fh:
            assert fh.read(8) == b"\x89HDF\r\n\x1a\n"

    back = read_wrf_grid(
        spark, str(tmp_path),
        bbox={"lat_min": -90, "lat_max": 90,
              "lon_min": -180, "lon_max": 180},
    ).toPandas()
    want = pdf.copy()
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
        g["xtime_min"].to_numpy(), w["xtime_min"].to_numpy()
    )


def test_nc4_writer_chunked_storage_for_grid_vars(tmp_path):
    """NC4Writer stores >1 KiB multi-dim variables chunked with
    shuffle+deflate: the raw file must NOT contain the plain bytes of
    the grid (they are compressed), while contiguous 1-D axes do."""
    p = str(tmp_path / "c.nc")
    w = NC4Writer(p)
    w.createDimension("t", 4)
    w.createDimension("y", 64)
    v = w.createVariable("RAINNC", "f8", ("t", "y"))
    arr = np.arange(256, dtype="f8").reshape(4, 64)
    v[:] = arr
    x = w.createVariable("XTIME", "i8", ("t",))
    x[:] = np.array([0, 60, 120, 180], dtype="i8")
    w.close()
    raw = open(p, "rb").read()
    assert arr.tobytes() not in raw  # deflated, not plain
    ds = HDF5Reader(raw)
    np.testing.assert_array_equal(ds.variables["RAINNC"][:], arr)
    np.testing.assert_array_equal(
        ds.variables["XTIME"][:], [0, 60, 120, 180]
    )
    # round-trip really went through zlib: recompress one chunk and
    # find it in the file (level 4, slab (1, 64))
    chunk = zlib.compress(
        np.frombuffer(arr[0].tobytes(), dtype="u1")
        .reshape(64, 8).T.tobytes(), 4
    )
    assert chunk in raw


def _f8_datatype() -> bytes:
    dt = struct.pack("<B3sI", 0x11, bytes([0x20, 63, 0]), 8)
    return dt + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)


def _contig_dataset_ohdr(out: bytearray, vals: np.ndarray) -> int:
    """Append data + an OHDR-v2 dataset header; return header addr."""
    data_addr = len(out)
    out += vals.tobytes()
    dspace = struct.pack("<BBBB", 2, len(vals.shape), 0, 1)
    dspace += b"".join(struct.pack("<Q", d) for d in vals.shape)
    layout = (struct.pack("<BB", 3, 1)
              + struct.pack("<QQ", data_addr, vals.nbytes))
    addr = len(out)
    out += _ohdr_v2([
        (0x01, dspace), (0x03, _f8_datatype()), (0x08, layout),
    ])
    return addr


def _link_msg(name: str, ohdr: int) -> bytes:
    nb = name.encode()
    return (struct.pack("<BBB", 1, 0, len(nb)) + nb
            + struct.pack("<Q", ohdr))


def _sb_v2(out: bytearray, root_addr: int) -> None:
    sb = bytearray(b"\x89HDF\r\n\x1a\n")
    sb += struct.pack("<BBBB", 2, 8, 8, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF8, len(out), root_addr)
    sb += struct.pack("<I", 0)
    assert len(sb) == 48
    out[:48] = sb


def _frhp(out: bytearray, root: int, cur_rows: int,
          heap_id_len: int = 7) -> int:
    """Append a fractal-heap header (width 4, start block 512,
    32-bit heap offsets, 2-byte lengths); return its address."""
    addr = len(out)
    h = bytearray(b"FRHP")
    h += struct.pack("<B", 0)                 # version
    h += struct.pack("<HHB", heap_id_len, 0, 0)
    h += struct.pack("<I", 512)               # max managed obj size
    h += struct.pack("<QQ", 0, _UNDEF8)       # next huge id, huge btree
    h += struct.pack("<QQ", 0, _UNDEF8)       # free space, fs mgr
    h += struct.pack("<QQQQ", 4096, 4096, 0, 3)
    h += struct.pack("<QQQQ", 0, 0, 0, 0)     # huge/tiny
    h += struct.pack("<H", 4)                 # table width
    h += struct.pack("<QQ", 512, 4096)        # start, max direct
    h += struct.pack("<H", 32)                # max heap size (bits)
    h += struct.pack("<H", 1)                 # starting rows
    h += struct.pack("<Q", root)
    h += struct.pack("<H", cur_rows)
    h += struct.pack("<I", 0)                 # checksum (unchecked)
    out += h
    return addr


def _heap_id(off: int, length: int) -> bytes:
    return struct.pack("<B", 0) + struct.pack("<I", off) + struct.pack(
        "<H", length
    )


def _bthd(out: bytearray, root: int, root_nrec: int, depth: int,
          total: int) -> int:
    addr = len(out)
    b = bytearray(b"BTHD")
    b += struct.pack("<BB", 0, 5)             # version, type 5 (links)
    b += struct.pack("<IH", 512, 11)          # node size, record size
    b += struct.pack("<H", depth)
    b += struct.pack("<BB", 85, 40)           # split/merge percent
    b += struct.pack("<Q", root)
    b += struct.pack("<H", root_nrec)
    b += struct.pack("<Q", total)
    b += struct.pack("<I", 0)                 # checksum (unchecked)
    out += b
    return addr


def test_dense_links_root_direct_block():
    """Dense link storage, smallest real shape: FRHP whose root IS a
    single direct block holding the serialized link messages, BTHD
    depth-0 name index.  This is what netCDF-4 emits past ~8 links."""
    a = np.array([1.0, 2.0], dtype="<f8")
    b = np.array([3.5], dtype="<f8")
    out = bytearray(b"\x00" * 48)
    da = _contig_dataset_ohdr(out, a)
    db = _contig_dataset_ohdr(out, b)

    links = [_link_msg("alpha", da), _link_msg("beta", db)]
    # direct block: FHDB header is 17 bytes (sig4+ver1+hdr8+off4);
    # heap offsets address the block INCLUDING its header
    dblock_addr = len(out)
    hdr_len = 4 + 1 + 8 + 4
    body = bytearray()
    ids = []
    off = hdr_len
    for lm in links:
        ids.append(_heap_id(off, len(lm)))
        body += lm
        off += len(lm)
    pad = 512 - hdr_len - len(body)
    fheap_pos = len(out) + 512  # FRHP written right after the block
    out += (b"FHDB" + struct.pack("<B", 0)
            + struct.pack("<Q", fheap_pos)
            + struct.pack("<I", 0) + body + b"\x00" * pad)
    fheap = _frhp(out, dblock_addr, cur_rows=0)
    assert fheap == fheap_pos
    # name-index v2 B-tree: depth 0, root leaf
    leaf_addr = len(out)
    leaf = bytearray(b"BTLF") + struct.pack("<BB", 0, 5)
    for i, hid in enumerate(ids):
        leaf += struct.pack("<I", i) + hid    # fake hash + heap id
    leaf += struct.pack("<I", 0)
    out += leaf
    btree = _bthd(out, leaf_addr, root_nrec=len(ids), depth=0,
                  total=len(ids))

    # root group: OHDR v2 with LINK_INFO pointing at heap + btree
    li = (struct.pack("<BB", 0, 0) + struct.pack("<Q", fheap)
          + struct.pack("<Q", btree))
    root = len(out)
    out += _ohdr_v2([(0x02, li)])
    _sb_v2(out, root)

    ds = HDF5Reader(bytes(out))
    assert sorted(ds.variables) == ["alpha", "beta"]
    np.testing.assert_array_equal(ds.variables["alpha"][:], a)
    np.testing.assert_array_equal(ds.variables["beta"][:], b)


def test_dense_links_root_indirect_and_depth1_btree():
    """The grown shapes: FRHP root is an INDIRECT block whose first
    row points at direct blocks, and the name index is a depth-1 v2
    B-tree (internal root over two leaves) — the layout a ~100-link
    group (full wrfout) reaches."""
    out = bytearray(b"\x00" * 48)
    names, addrs = [], []
    for i in range(6):
        arr = np.array([float(i), float(i) + 0.5], dtype="<f8")
        addrs.append(_contig_dataset_ohdr(out, arr))
        names.append(f"var{i:02d}")

    # two direct blocks, 3 links each; heap offsets are GLOBAL
    # (block 0 covers [0,512), block 1 covers [512,1024))
    hdr_len = 4 + 1 + 8 + 4
    fheap_guess = None  # patched below via two-pass assembly
    blocks, ids = [], []
    for bi in range(2):
        body = bytearray()
        off = bi * 512 + hdr_len
        for i in range(3 * bi, 3 * bi + 3):
            lm = _link_msg(names[i], addrs[i])
            ids.append(_heap_id(off, len(lm)))
            body += lm
            off += len(lm)
        blocks.append(body)
    dblock_addrs = []
    # reserve: indirect block + FRHP positions known after blocks
    for bi, body in enumerate(blocks):
        dblock_addrs.append(len(out))
        pad = 512 - hdr_len - len(body)
        out += (b"FHDB" + struct.pack("<B", 0)
                + struct.pack("<Q", 0)        # heap hdr addr (unchecked)
                + struct.pack("<I", bi * 512)
                + body + b"\x00" * pad)
    # root indirect block: sig, ver, heap hdr, block offset, entries
    iblock_addr = len(out)
    ib = bytearray(b"FHIB") + struct.pack("<B", 0) + struct.pack("<Q", 0)
    ib += struct.pack("<I", 0)
    for bi in range(4):  # one row, width 4
        ib += struct.pack(
            "<Q", dblock_addrs[bi] if bi < 2 else _UNDEF8
        )
    ib += struct.pack("<I", 0)
    out += ib
    fheap = _frhp(out, iblock_addr, cur_rows=1)

    # depth-1 name index: two leaves of 3 records... the internal
    # root holds ONE separating record, so leaves carry 3 + 2 and the
    # 6th record lives in the root
    def leaf(recs):
        addr = len(out)
        lf = bytearray(b"BTLF") + struct.pack("<BB", 0, 5)
        for i, hid in recs:
            lf += struct.pack("<I", i) + hid
        lf += struct.pack("<I", 0)
        out.extend(lf)  # .extend: += would rebind the closed-over name
        return addr

    recs = list(enumerate(ids))
    l0 = leaf(recs[0:3])
    l1 = leaf(recs[4:6])
    # internal root per the spec layout: ALL records first (here the
    # one separating record, recs[3]), THEN the N+1 child pointers
    max_leaf = (512 - 10) // 11
    assert max_leaf < 256  # nrec field is 1 byte
    root_node = len(out)
    rn = bytearray(b"BTIN") + struct.pack("<BB", 0, 5)
    rn += struct.pack("<I", recs[3][0]) + recs[3][1]
    rn += struct.pack("<Q", l0) + struct.pack("<B", 3)
    rn += struct.pack("<Q", l1) + struct.pack("<B", 2)
    rn += struct.pack("<I", 0)
    out += rn
    btree = _bthd(out, root_node, root_nrec=1, depth=1, total=6)

    li = (struct.pack("<BB", 0, 0) + struct.pack("<Q", fheap)
          + struct.pack("<Q", btree))
    root = len(out)
    out += _ohdr_v2([(0x02, li)])
    _sb_v2(out, root)

    ds = HDF5Reader(bytes(out))
    assert sorted(ds.variables) == names
    for i, n in enumerate(names):
        np.testing.assert_array_equal(
            ds.variables[n][:], [float(i), float(i) + 0.5]
        )


def test_vlen_string_attribute_via_global_heap():
    """h5py-style variable-length string attribute: datatype class 9
    (vlen, string variant), value = (length, global-heap collection
    address, object index) resolved through GCOL."""
    vals = np.array([7.5], dtype="<f8")
    out = bytearray(b"\x00" * 48)

    # global heap with one object: the string bytes
    text = b"minutes since 2024-06-01"
    gaddr = len(out)
    g = bytearray(b"GCOL") + struct.pack("<B3s", 1, b"\x00" * 3)
    obj = struct.pack("<HH4sQ", 1, 1, b"\x00" * 4, len(text)) + text
    obj += b"\x00" * (-len(text) % 8)
    term = struct.pack("<HH4sQ", 0, 0, b"\x00" * 4, 0)
    g += struct.pack("<Q", 4 + 4 + 8 + len(obj) + len(term))
    g += obj + term
    out += g

    data_addr = len(out)
    out += vals.tobytes()
    dspace = struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", 1)
    layout = (struct.pack("<BB", 3, 1)
              + struct.pack("<QQ", data_addr, vals.nbytes))
    # vlen-string attr: class 9 version 1, bits[0]=1 (string), size 16
    vdt = struct.pack("<B3sI", 0x19, bytes([0x01, 0, 0]), 16)
    vdt += struct.pack("<B3sI", 0x13, b"\x00\x00\x00", 1)  # base char
    ads = struct.pack("<BBBB", 2, 0, 0, 0)  # scalar
    attr = struct.pack("<BBHHHB", 3, 0, 12, len(vdt), len(ads), 0)
    attr += b"description\x00" + vdt + ads
    attr += struct.pack("<I", len(text)) + struct.pack("<Q", gaddr)
    attr += struct.pack("<I", 1)
    dset = len(out)
    out += _ohdr_v2([
        (0x01, dspace), (0x03, _f8_datatype()), (0x08, layout),
        (0x0C, attr),
    ])
    root = len(out)
    out += _ohdr_v2([(0x06, _link_msg("XTIME", dset))])
    _sb_v2(out, root)

    ds = HDF5Reader(bytes(out))
    v = ds.variables["XTIME"]
    assert v.description == "minutes since 2024-06-01"
    np.testing.assert_array_equal(v[:], vals)


def test_string_dataset_is_skipped_not_fatal(tmp_path):
    """wrfout files carry a char variable Times(Time, DateStrLen);
    a string-typed DATASET must be skipped, not abort the file."""
    vals = np.array([1.0, 2.0], dtype="<f8")
    out = bytearray(b"\x00" * 48)
    num = _contig_dataset_ohdr(out, vals)
    # string dataset: class-3 fixed string, contiguous
    sdata = len(out)
    out += b"2024-06-01_00:00:00"
    dspace = struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", 1)
    sdt = struct.pack("<B3sI", 0x13, b"\x00\x00\x00", 19)
    layout = struct.pack("<BB", 3, 1) + struct.pack("<QQ", sdata, 19)
    times = len(out)
    out += _ohdr_v2([(0x01, dspace), (0x03, sdt), (0x08, layout)])
    root = len(out)
    out += _ohdr_v2([
        (0x06, _link_msg("RAINNC", num)),
        (0x06, _link_msg("Times", times)),
    ])
    _sb_v2(out, root)
    ds = HDF5Reader(bytes(out))
    assert list(ds.variables) == ["RAINNC"]  # Times skipped quietly
    np.testing.assert_array_equal(ds.variables["RAINNC"][:], vals)


def test_writer_widens_large_int_attrs_to_i8(tmp_path):
    """HDF5 has native 64-bit ints: an attribute beyond int32 must be
    stored widened, not silently wrapped (the classic writer's twin
    refuses; here widening is the correct fix)."""
    p = str(tmp_path / "w.h5")
    w = HDF5Writer(p)
    w.create_dataset("v", np.array([1.0]), attrs={"big": 2**40})
    w.close()
    ds = HDF5Reader(open(p, "rb").read())
    assert int(ds.variables["v"]._attrs["big"]) == 2**40


def test_roundtrip_property_any_shape_dtype_storage():
    """Hypothesis: any mix of shapes, numeric dtypes, and storage
    modes (contiguous / chunked / chunked+shuffle+deflate)
    round-trips bit-exactly through HDF5Writer → HDF5Reader — the
    HDF5 twin of netcdf3's roundtrip property."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    dtypes = ["i1", "u1", "i2", "u2", "i4", "u4", "i8", "u8",
              "f4", "f8"]

    @st.composite
    def payload(draw):
        rank = draw(st.integers(1, 3))
        shape = tuple(draw(st.integers(1, 5)) for _ in range(rank))
        n_vars = draw(st.integers(1, 3))
        vars_ = []
        for vi in range(n_vars):
            dt = draw(st.sampled_from(dtypes))
            mode = draw(st.sampled_from(["contig", "chunk", "gz"]))
            rng = np.random.RandomState(draw(st.integers(0, 999)))
            if dt.startswith("f"):
                arr = rng.uniform(-1e6, 1e6, size=shape).astype(dt)
            else:
                info = np.iinfo(np.dtype(dt))
                arr = rng.randint(
                    info.min, min(info.max, 2**31 - 1),
                    size=shape,
                ).astype(dt)
            vars_.append((f"v{vi}", arr, mode))
        return vars_

    @settings(max_examples=25, deadline=None)
    @given(payload())
    def run(vars_):
        def build(w):
            for name, arr, mode in vars_:
                if mode == "contig":
                    w.create_dataset(name, arr)
                else:
                    chunks = tuple(
                        max(1, s // 2) for s in arr.shape
                    )
                    w.create_dataset(
                        name, arr, chunks=chunks,
                        gzip=4 if mode == "gz" else None,
                        shuffle=(mode == "gz"),
                    )

        _, ds = _roundtrip(build)
        for name, arr, _ in vars_:
            got = np.asarray(ds.variables[name][:])
            assert got.dtype.str.lstrip("<>=|") == arr.dtype.str.lstrip(
                "<>=|"
            )
            np.testing.assert_array_equal(got, arr)

    run()


def test_dense_attribute_storage():
    """netCDF-4 moves attributes into a fractal heap past ~8 per
    object (every real wrfout variable): ATTRIBUTE_INFO message +
    type-8 name-index B-tree records (heap ID first) over serialized
    attribute messages."""
    vals = np.array([4.5, 6.0], dtype="<f8")
    out = bytearray(b"\x00" * 48)
    data_addr = len(out)
    out += vals.tobytes()

    # serialized attribute-v3 messages as heap objects
    def attr_msg(name: str, text: str) -> bytes:
        nb = name.encode() + b"\x00"
        tb = text.encode() + b"\x00"
        adt = struct.pack("<B3sI", 0x13, b"\x00\x00\x00", len(tb))
        ads = struct.pack("<BBBB", 2, 0, 0, 0)
        return (struct.pack("<BBHHHB", 3, 0, len(nb), len(adt),
                            len(ads), 0)
                + nb + adt + ads + tb)

    attrs = {f"attr{i:02d}": f"value-{i}" for i in range(10)}
    hdr_len = 4 + 1 + 8 + 4
    body = bytearray()
    ids = []
    off = hdr_len
    for k in sorted(attrs):
        am = attr_msg(k, attrs[k])
        # type-8 btree record: heap ID padded to 8, flags, order, hash
        ids.append(_heap_id(off, len(am)) + b"\x00")
        body += am
        off += len(am)
    assert off <= 512
    dblock_addr = len(out)
    fheap_pos = len(out) + 512
    out += (b"FHDB" + struct.pack("<B", 0)
            + struct.pack("<Q", fheap_pos)
            + struct.pack("<I", 0) + body
            + b"\x00" * (512 - hdr_len - len(body)))
    fheap = _frhp(out, dblock_addr, cur_rows=0)

    # type-8 records: heap id(8) + flags(1) + creation order(4) + hash(4)
    rec_size = 8 + 1 + 4 + 4
    leaf_addr = len(out)
    leaf = bytearray(b"BTLF") + struct.pack("<BB", 0, 8)
    for i, hid in enumerate(ids):
        leaf += hid + struct.pack("<B", 0) + struct.pack("<I", i)
        leaf += struct.pack("<I", 0)
    leaf += struct.pack("<I", 0)
    out += leaf
    btree_addr = len(out)
    b = bytearray(b"BTHD") + struct.pack("<BB", 0, 8)
    b += struct.pack("<IH", 512, rec_size) + struct.pack("<H", 0)
    b += struct.pack("<BB", 85, 40) + struct.pack("<Q", leaf_addr)
    b += struct.pack("<H", len(ids)) + struct.pack("<Q", len(ids))
    b += struct.pack("<I", 0)
    out += b

    dspace = struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", 2)
    layout = (struct.pack("<BB", 3, 1)
              + struct.pack("<QQ", data_addr, vals.nbytes))
    ainfo = (struct.pack("<BB", 0, 0) + struct.pack("<Q", fheap)
             + struct.pack("<Q", btree_addr))
    dset = len(out)
    out += _ohdr_v2([
        (0x01, dspace), (0x03, _f8_datatype()), (0x08, layout),
        (0x15, ainfo),
    ])
    root = len(out)
    out += _ohdr_v2([(0x06, _link_msg("RAINNC", dset))])
    _sb_v2(out, root)

    ds = HDF5Reader(bytes(out))
    v = ds.variables["RAINNC"]
    for k, want in attrs.items():
        assert v._attrs[k] == want, k
    np.testing.assert_array_equal(v[:], vals)


def test_v1_object_header_continuation_block():
    """A v1 object header whose messages spill into a CONTINUATION
    block (0x0010) is followed — netCDF-4 emits these when a
    variable's messages outgrow the initial header allocation."""
    vals = np.array([1.25, 2.5, 3.75], dtype="<f8")
    out = bytearray(b"\x00" * 48)
    data_addr = len(out)
    out += vals.tobytes()

    dspace = struct.pack("<BBB5s", 1, 1, 0, b"\x00" * 5)
    dspace += struct.pack("<Q", 3)
    layout = (struct.pack("<BB", 3, 1)
              + struct.pack("<QQ", data_addr, vals.nbytes))

    def pad8(b):
        return b + b"\x00" * (-len(b) % 8)

    def msg(t, b):
        b = pad8(b)
        return struct.pack("<HHB3s", t, len(b), 0, b"\x00" * 3) + b

    # continuation block holds the layout message
    cont_block = msg(0x0008, layout)
    # header block: dataspace + datatype + continuation pointer
    cont_addr_pos = None
    blk = bytearray()
    blk += msg(0x0001, dspace)
    blk += msg(0x0003, _f8_datatype())
    cont_body = struct.pack("<QQ", 0, len(cont_block))  # patched
    blk += msg(0x0010, cont_body)

    dset = len(out)
    hdr = struct.pack("<BBHII4s", 1, 0, 4, 1, len(blk), b"\x00" * 4)
    out += hdr + blk
    cont_addr = len(out)
    out += cont_block
    # patch the continuation offset (it sits 16 bytes before the end
    # of the header block: 8-byte msg header + first 8 bytes of body)
    patch_at = dset + len(hdr) + len(blk) - 16
    out[patch_at:patch_at + 8] = struct.pack("<Q", cont_addr)

    root = len(out)
    out += _ohdr_v2([(0x06, _link_msg("v", dset))])
    _sb_v2(out, root)

    ds = HDF5Reader(bytes(out))
    np.testing.assert_array_equal(ds.variables["v"][:], vals)


def test_nested_groups_prefix_variable_names():
    """Subgroups recurse with a path prefix — netCDF-4 groups."""
    a = np.array([9.0], dtype="<f8")
    out = bytearray(b"\x00" * 48)
    dset = _contig_dataset_ohdr(out, a)
    sub = len(out)
    out += _ohdr_v2([(0x06, _link_msg("inner", dset))])
    root = len(out)
    out += _ohdr_v2([(0x06, _link_msg("sub", sub))])
    _sb_v2(out, root)
    ds = HDF5Reader(bytes(out))
    assert list(ds.variables) == ["sub/inner"]
    np.testing.assert_array_equal(ds.variables["sub/inner"][:], a)
