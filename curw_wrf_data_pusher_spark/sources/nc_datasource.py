"""Spark 4 Python DataSource for the WRF NetCDF lake:

    register_wrfgrid(spark, codec=stub_open)   # codec optional
    df = (spark.read.format("wrfgrid")
          .option("variable", "RAINNC")
          .option("bbox", "6.6,7.4,79.6,81.0")
          .load("/lake/wrf"))

Why a DataSource and not just ``read_wrf_grid``: the reader becomes a
first-class scan node — ``.load()`` composes with every DataFrame op,
the schema is declared to Catalyst up front (column pruning applies),
and partition planning is explicit: ONE INPUT PARTITION PER .nc FILE
by default, so a 10k-file day fans out across the cluster with no
binaryFile intermediary and no single-task listing bottleneck beyond
the driver glob (the same listing every file source performs).  With
``.option("splits_per_file", N)`` each file becomes N partitions,
partition k decoding time slab ``[k*T/N, (k+1)*T/N)`` through the
codecs' lazy hyperslab path — the big-file / straggler remedy
(``netcdf.read_wrf_grid_split`` is the mapInArrow twin).

Decode is ``sources.netcdf.decode_grid_bytes`` — the same
``_grid_arrays`` core the mapInArrow path runs, so the two
ingestion routes cannot drift
(equality is test-pinned).  The codec (bytes → dataset) is captured on
the driver at registration and travels to executors by cloudpickle,
which is how the container's stub codec stands in for the absent
netCDF4 C library; with netCDF4 installed the default codec reads real
files.

Pushdown status: bbox / variable / t-slice arrive as READER OPTIONS —
pushdown by contract rather than by Catalyst filter translation (the
Python DataSource filter-pushdown API only covers simple column
predicates; the hyperslab slice needs the axis arrays, so an explicit
option is the honest interface).
"""

from __future__ import annotations

import glob
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from .netcdf import GRID_SCHEMA, SL_EXTENT, decode_grid_bytes

def _default_codec(content: bytes):
    from netCDF4 import Dataset

    return Dataset("inmem", memory=content)


class _FilePartition(InputPartition):
    def __init__(self, path: str, mtime_us: int, split_id: int = 0,
                 n_splits: int = 1):
        self.path = path
        self.mtime_us = mtime_us
        self.split_id = split_id
        self.n_splits = n_splits


class WrfGridDataSource(DataSource):
    #: codec captured at registration time as a CLASS attribute —
    #: module globals do NOT travel to the separate Python worker that
    #: instantiates the DataSource, but cloudpickle ships the
    #: registered class by value, attributes included.
    _codec = None

    @classmethod
    def name(cls) -> str:
        return "wrfgrid"

    def schema(self) -> str:
        return GRID_SCHEMA

    def reader(self, schema) -> "WrfGridReader":
        return WrfGridReader(self.options, type(self)._codec)


class WrfGridReader(DataSourceReader):
    def __init__(self, options: dict, codec):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wrfgrid: .load(path) is required")
        self.variable = options.get("variable", "RAINNC")
        self.system_from_path = (
            options.get("system_from_path", "true").lower() == "true"
        )
        bbox = options.get("bbox")
        if bbox:
            lat_min, lat_max, lon_min, lon_max = (
                float(x) for x in bbox.split(",")
            )
            self.bbox = {
                "lat_min": lat_min, "lat_max": lat_max,
                "lon_min": lon_min, "lon_max": lon_max,
            }
        else:
            self.bbox = dict(SL_EXTENT)
        t0, t1 = options.get("t0"), options.get("t1")
        if (t0 is None) != (t1 is None):
            missing = "t1" if t1 is None else "t0"
            raise ValueError(
                "wrfgrid: options t0 and t1 must be set together "
                f"(got {'t0' if missing == 't1' else 't1'} without "
                f"{missing})"
            )
        self.t_slice = (int(t0), int(t1)) if t0 is not None else None
        # splits_per_file > 1: N input partitions per file, partition k
        # decoding time slab [k*T/N, (k+1)*T/N) through the codecs'
        # lazy hyperslab path — the DataSource twin of
        # netcdf.read_wrf_grid_split (one big wrfout no longer pins
        # one core; route equality is test-pinned)
        self.splits_per_file = max(
            1, int(options.get("splits_per_file", "1"))
        )
        self.codec = codec or _default_codec

    def partitions(self):
        files = sorted(
            glob.glob(os.path.join(self.path, "**", "*.nc"), recursive=True)
        )
        n = self.splits_per_file
        stats = [(f, os.stat(f).st_mtime_ns // 1000) for f in files]
        return [
            _FilePartition(f, mt, k, n)
            for f, mt in stats
            for k in range(n)
        ]

    def _slab(self, partition: _FilePartition, content) -> tuple | None:
        """This partition's [t0, t1) within the file (∩ the t0/t1
        option); None when the slab is empty or covers everything."""
        if partition.n_splits == 1:
            return self.t_slice
        ds = self.codec(content)
        try:
            n_t = int(ds.variables["XTIME"].shape[0])
        finally:
            ds.close()
        lo, hi = self.t_slice or (0, n_t)
        hi = min(hi, n_t)
        span = max(0, hi - lo)
        t0 = lo + (partition.split_id * span) // partition.n_splits
        t1 = lo + ((partition.split_id + 1) * span) // partition.n_splits
        return (t0, t1)

    def read(self, partition: _FilePartition):
        with open(partition.path, "rb") as fh:
            content = fh.read()
        t_slice = self._slab(partition, content)
        if t_slice is not None and t_slice[1] <= t_slice[0]:
            return
        mtime = datetime.fromtimestamp(
            partition.mtime_us / 1e6, tz=timezone.utc
        ).replace(tzinfo=None)
        pdf = decode_grid_bytes(
            content,
            path=partition.path,
            mtime=mtime,
            bbox=self.bbox,
            variable=self.variable,
            t_slice=t_slice,
            system_from_path=self.system_from_path,
            open_dataset=self.codec,
        )
        if pdf is None:
            return
        # one Arrow batch per file: the DataSource API accepts
        # pyarrow.RecordBatch from read(), which skips per-row Python
        # tuple conversion entirely — the decode frame crosses into
        # the JVM as columnar buffers
        import pyarrow as pa

        target = pa.schema(
            [
                ("wrf_system", pa.string()),
                ("source_file", pa.string()),
                ("fgt_utc", pa.timestamp("us")),
                ("epoch_str", pa.string()),
                ("t_idx", pa.int32()),
                ("xtime_min", pa.int64()),
                ("y", pa.int32()),
                ("x", pa.int32()),
                ("latitude", pa.float64()),
                ("longitude", pa.float64()),
                ("rainnc_cum", pa.float64()),
            ]
        )
        yield pa.RecordBatch.from_pandas(
            pdf, schema=target, preserve_index=False
        )


def register_wrfgrid(spark, codec=None) -> None:
    """Register the ``wrfgrid`` format on a session.  ``codec``
    (bytes → dataset-like) overrides the netCDF4 default — the stub
    injection point in this container.  The codec rides on a
    registration-time subclass so it survives the pickle hop into
    Spark's Python data-source worker."""
    if codec is None:
        cls = WrfGridDataSource
    else:
        cls = type(
            "WrfGridDataSource",
            (WrfGridDataSource,),
            {"_codec": staticmethod(codec)},
        )
    spark.dataSource.register(cls)
