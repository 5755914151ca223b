"""Edge-list readers for the classic graph-benchmark file formats.

Covers the reference's reader dispatch (gms/third_party/gapbs/reader.h:220-248):
  .el    whitespace 'u v' rows                 (reader.h:50-57)
  .wel   'u v w'                               (reader.h:59-67)
  .gr    DIMACS, 'a u v w' rows, 1-based       (reader.h:70-85)
  .mtx   MatrixMarket coordinate, 1-based,     (reader.h:148-218)
         honoring the 'symmetric' header and the field type
         (pattern → unweighted; real/double/integer → weight column)
  .graph METIS adjacency-per-line, 1-based,    (reader.h:88-145)
         fmt flag 1 → alternating neighbor/weight pairs

The reference's binary .sg/.wsg memory images are supported for interop
(read_sg/write_sg, reader.h:252-298 layout, driver-side — one memory
image is not splittable); the engine's own snapshot format remains the
TableIO parquet tables (parallel-readable, schema'd, atomic).

All readers return edges(src: long, dst: long[, weight: double]) and are
plain DataFrame plans (csv/text scan + select/filter), so Catalyst prunes
and parallelizes the scan; nothing is collected on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_list(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    if fmt is None:
        fmt = path.rsplit(".", 1)[-1].lower()
    if fmt == "el":
        return _read_el(spark, path, weighted=False)
    if fmt == "wel":
        return _read_el(spark, path, weighted=True)
    if fmt == "gr":
        return _read_gr(spark, path)
    if fmt == "mtx":
        return _read_mtx(spark, path)
    if fmt == "graph":
        return _read_metis(spark, path)
    raise ValueError(f"unknown edge-list format: {fmt}")


def _tokens(line):
    return F.split(F.trim(line), r"\s+")


def _read_el(spark: SparkSession, path: str, weighted: bool) -> DataFrame:
    df = spark.read.text(path)
    t = _tokens(df["value"])
    out = df.where(F.trim("value") != "").where(~F.col("value").startswith("#"))
    cols = [t.getItem(0).cast("long").alias("src"), t.getItem(1).cast("long").alias("dst")]
    if weighted:
        cols.append(t.getItem(2).cast("double").alias("weight"))
    return out.select(*cols)


def _read_gr(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.text(path)
    t = _tokens(df["value"])
    return (
        df.where(F.col("value").startswith("a"))
        .select(
            (t.getItem(1).cast("long") - 1).alias("src"),
            (t.getItem(2).cast("long") - 1).alias("dst"),
            t.getItem(3).cast("double").alias("weight"),
        )
    )


def _read_mtx(spark: SparkSession, path: str) -> DataFrame:
    """MatrixMarket coordinate reader, honoring the header's field and
    symmetry the way the reference does (reader.h:146-218): field
    ``pattern`` → no weights; ``real``/``double``/``integer`` → a
    ``weight: double`` column from the value entry; ``complex`` →
    error. ``symmetric`` mirrors every edge (weight kept);
    ``general``/``skew-symmetric`` don't; other symmetries error."""
    from pyspark.sql.window import Window

    header = spark.read.text(path).limit(1).collect()[0][0].split()
    if len(header) < 5 or header[0] != "%%MatrixMarket":
        raise ValueError(f".mtx file did not start with a %%MatrixMarket header: {path}")
    field, symmetry = header[3].lower(), header[4].lower()
    if field == "pattern":
        weighted = False
    elif field in ("real", "double", "integer"):
        weighted = True
    else:
        raise ValueError(f"unsupported .mtx field type (reader.h:168-177): {field}")
    if symmetry == "symmetric":
        symmetric = True
    elif symmetry in ("general", "skew-symmetric"):
        symmetric = False
    else:
        raise ValueError(f"unsupported .mtx symmetry type (reader.h:178-186): {symmetry}")

    df = spark.read.text(path).where(~F.col("value").startswith("%")).where(F.trim("value") != "")
    sizes = df.limit(1).collect()[0][0].split()
    sr, sc = int(sizes[0]) - 1, int(sizes[1]) - 1
    t = _tokens(df["value"])
    cols = [
        (t.getItem(0).cast("long") - 1).alias("src"),
        (t.getItem(1).cast("long") - 1).alias("dst"),
    ]
    if weighted:
        cols.append(t.getItem(2).cast("double").alias("weight"))
    body = df.select(*cols)
    # Remove exactly one occurrence of the sizes row (it parses as an edge).
    w = Window.partitionBy("src", "dst").orderBy(F.lit(1))
    body = (
        body.withColumn("_rn", F.row_number().over(w))
        .where(~((F.col("src") == sr) & (F.col("dst") == sc) & (F.col("_rn") == 1)))
        .drop("_rn")
    )
    if symmetric:
        rev = [F.col("dst").alias("src"), F.col("src").alias("dst")] + (
            [F.col("weight")] if weighted else []
        )
        body = body.unionAll(body.select(*rev))
    return body


def _read_metis(spark: SparkSession, path: str) -> DataFrame:
    """METIS adjacency reader (reader.h:88-143): line i (1-based, after
    the header, '%' comment lines skipped WITHOUT consuming a vertex
    index) lists the neighbors of vertex i. The header's optional third
    field is the fmt flag: ``1`` → per-edge weights, lines alternate
    ``v1 w1 v2 w2 …`` and a ``weight: double`` column is returned;
    ``0``/``100`` → unweighted (exactly the fmt set the reference
    accepts — anything else raises, reader.h:104-110).

    Line numbers come from a monotonically_increasing_id ordered by a
    GLOBAL single-partition window — fine for METIS's config-sized
    files, but it serializes the scan: do not point this at a
    many-GB adjacency file (use .el/.wel/parquet for bulk edges)."""
    from pyspark.sql.window import Window

    first = spark.read.text(path).where(~F.col("value").startswith("%")).limit(1).collect()[0][0]
    hdr = first.split()
    fmt = int(hdr[2]) if len(hdr) > 2 else 0
    if fmt == 1:
        weighted = True
    elif fmt in (0, 100):
        weighted = False
    else:
        raise ValueError(f"unsupported METIS fmt flag (reader.h:104-110): {fmt}")

    df = spark.read.text(path).select("value").where(~F.col("value").startswith("%"))
    df = df.withColumn("_ln", F.monotonically_increasing_id())
    df = df.withColumn("_ln", F.row_number().over(Window.orderBy("_ln")) - 1)
    body = df.where(F.col("_ln") > 0).where(F.trim("value") != "")
    toks = _tokens(F.col("value"))
    if not weighted:
        return body.select(
            (F.col("_ln") - 1).alias("src"),
            F.explode(toks).alias("d"),
        ).select("src", (F.col("d").cast("long") - 1).alias("dst"))
    # weighted: tokens alternate neighbor/weight — pair them positionally
    # (element_at is 1-based). A line's token array is O(degree), the
    # same as the text row itself, so no new hub hazard is introduced.
    pairs = F.transform(
        F.sequence(F.lit(0), (F.size(toks) / 2).cast("int") - 1),
        lambda j: F.struct(
            F.element_at(toks, (j * 2 + 1).cast("int")).alias("d"),
            F.element_at(toks, (j * 2 + 2).cast("int")).alias("w"),
        ),
    )
    return (
        body.where(F.size(toks) >= 2)
        .select((F.col("_ln") - 1).alias("src"), F.explode(pairs).alias("p"))
        .select(
            "src",
            (F.col("p.d").cast("long") - 1).alias("dst"),
            F.col("p.w").cast("double").alias("weight"),
        )
    )


def read_sg(spark: SparkSession, path: str, inverse: bool = False) -> DataFrame:
    """GAPBS binary CSR snapshot (.sg / .wsg) → edges DataFrame.

    Layout per gms/third_party/gapbs/reader.h:252-298 / writer.h:39-69:
    [bool directed][int64 num_edges][int64 num_nodes]
    [(n+1)·int64 offsets][num_edges neighbors], where a neighbor is an
    int32 dst (.sg) or an (int32 dst, int32 weight) pair (.wsg); a
    directed file appends the inverse CSR (same offsets+neighbors
    shape). ``inverse=True`` returns the inverse image — (src=v,
    dst=u) rows for each stored in-neighbor u of v, the reference's
    in_neigh surface (graph.h:265-268) — and falls back to the forward
    CSR for undirected files, where the graph is its own inverse.
    Parsed on the driver: a .sg file is a single process memory image,
    not a splittable format — this reader exists for interop/
    cross-validation with reference-serialized graphs, while the
    engine's own snapshot format remains TableIO parquet (readable in
    parallel, schema'd, atomic).
    """
    import numpy as np
    import pandas as pd

    weighted = path.endswith(".wsg")
    with open(path, "rb") as f:
        buf = f.read()
    off = 0
    directed = bool(buf[0])
    off += 1
    num_edges = int(np.frombuffer(buf, "<i8", 1, off)[0])
    off += 8
    num_nodes = int(np.frombuffer(buf, "<i8", 1, off)[0])
    off += 8

    def read_csr(off):
        offsets = np.frombuffer(buf, "<i8", num_nodes + 1, off)
        off += 8 * (num_nodes + 1)
        if weighted:
            nb = np.frombuffer(buf, "<i4", num_edges * 2, off).reshape(-1, 2)
            off += 8 * num_edges
            dst, wts = nb[:, 0], nb[:, 1]
        else:
            dst = np.frombuffer(buf, "<i4", num_edges, off)
            off += 4 * num_edges
            wts = None
        src = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(offsets))
        return src, dst, wts, off

    src, dst, wts, off = read_csr(off)
    if inverse and directed:
        # the appended inverse image: offsets index by dst, neighbors are srcs
        v, u, wts, off = read_csr(off)
        src, dst = v, u
    pdf = pd.DataFrame({"src": src, "dst": dst.astype(np.int64)})
    if wts is not None:
        pdf["weight"] = wts.astype(np.float64)
    return spark.createDataFrame(pdf)


def write_sg(edges: DataFrame, path: str, directed: bool = False) -> None:
    """Serialize an edge table as a GAPBS .sg/.wsg memory image
    (writer.h:39-69 layout). ``directed=False`` (default) matches the
    reference's default-symmetrize ingest — callers pass the
    symmetrized table; ``directed=True`` additionally appends the
    inverse CSR image (builder.h:279-297 — offsets indexed by dst,
    neighbors = in-srcs), which ``read_sg(..., inverse=True)``
    round-trips. Driver-side (the format is one memory image);
    intended for interop/testing, not as the engine's checkpoint path.
    Weighted output requires integer-valued weights (.wsg stores
    int32, the only weight type the format supports —
    reader.h:266-270)."""
    import struct

    import numpy as np

    weighted = path.endswith(".wsg")
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    pdf = edges.select(*cols).orderBy("src", "dst").toPandas()
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    wts = None
    if weighted:
        w = pdf["weight"].to_numpy()
        if not np.allclose(w, np.round(w)):
            raise ValueError(".wsg stores int32 weights; non-integer weights given")
        wts = np.round(w).astype("<i4")
    n = int(max(src.max(), dst.max()) + 1) if len(src) else 0
    m = len(src)

    def write_csr(f, key, val, val_w):
        order = np.lexsort((val, key))
        key, val = key[order], val[order]
        counts = np.bincount(key, minlength=n)
        f.write(np.concatenate([[0], np.cumsum(counts)]).astype("<i8").tobytes())
        if weighted:
            nb = np.empty((m, 2), dtype="<i4")
            nb[:, 0] = val
            nb[:, 1] = val_w[order]
            f.write(nb.tobytes())
        else:
            f.write(val.astype("<i4").tobytes())

    with open(path, "wb") as f:
        f.write(struct.pack("<?", directed))
        f.write(struct.pack("<q", m))
        f.write(struct.pack("<q", n))
        write_csr(f, src, dst, wts)
        if directed:
            write_csr(f, dst, src, wts)
