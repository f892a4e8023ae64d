"""Relational pipelines over the TPC-H-ish driver tables.

The reference has no joins or relational aggregates (single-document
model, SURVEY.md §2.4-2.5) — these are the engine-new relational layer,
built on the idioms the 100 TB design requires:

* **Map-side combine**: per-batch partial aggregation inside
  ``map_batches`` so the wide step moves partials, never raw rows.
* **Broadcast hash join**: the small side (customer/nation/region) is
  ``ray.put`` once and read inside tasks — no shuffle join for
  dimension tables.
* **Exact numerics for verifiability**: money is aggregated in integer
  cents (``round(x*100) → int64``) so Ray and the DuckDB oracle agree
  bit-for-bit regardless of summation order.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns: list[str]):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


def _cents(x) -> np.ndarray:
    return np.rint(np.asarray(x, dtype=np.float64) * 100).astype(np.int64)


# ---------------------------------------------------------------------------
# Q1-style pricing summary: filter → map-side combine → tiny final reduce
# ---------------------------------------------------------------------------

def q1_pricing(sf_dir: str, ship_cutoff: str = "1998-09-02") -> pd.DataFrame:
    cutoff = pd.Timestamp(ship_cutoff)

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["l_shipdate"] <= cutoff]
        df["sum_qty"] = df["l_quantity"].astype("int64")
        df["sum_base_cents"] = _cents(df["l_extendedprice"])
        # discounted value in integer cent-hundredths: cents x (100 - bp)
        # where bp = discount in whole percent — all-integer, so Ray and the
        # SQL oracle agree exactly (float rounding of price*(1-disc) ties
        # differently between numpy round-half-even and SQL half-away)
        bp = _cents(df["l_discount"])  # 0.05 -> 5
        df["sum_disc_cc"] = df["sum_base_cents"] * (100 - bp)
        agg = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
                 .agg(sum_qty=("sum_qty", "sum"),
                      sum_base_cents=("sum_base_cents", "sum"),
                      sum_disc_cc=("sum_disc_cc", "sum"),
                      count_order=("l_quantity", "size"))
                 .reset_index())
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = (_read(sf_dir, "lineitem",
                      ["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount", "l_shipdate"])
                .map_batches(partial, batch_format="pyarrow")
                .to_pandas())
    # final reduce: cardinality is bounded by |returnflag| x |linestatus|
    out = (partials.groupby(["l_returnflag", "l_linestatus"], sort=False)
           .sum().reset_index()
           .sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    out["count_order"] = out["count_order"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# top customers by revenue: groupby-sum + broadcast dimension join + top-k
# ---------------------------------------------------------------------------

def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["revenue_cents"] = _cents(df["o_totalprice"])
        agg = (df.groupby("o_custkey", sort=False)
                 .agg(revenue_cents=("revenue_cents", "sum"),
                      n_orders=("o_totalprice", "size"))
                 .reset_index())
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    totals = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("o_custkey")
              .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                         Sum("n_orders", alias_name="n_orders"))
              .to_pandas())
    top = (totals.sort_values(["revenue_cents", "o_custkey"],
                              ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    names = ray.get(name_ref)
    top["c_name"] = top["o_custkey"].map(names)
    top["n_orders"] = top["n_orders"].astype("int64")
    return top[["o_custkey", "c_name", "revenue_cents", "n_orders"]]


# ---------------------------------------------------------------------------
# revenue by region: two broadcast dimension hops + map-side combine
# ---------------------------------------------------------------------------

def region_revenue(sf_dir: str) -> pd.DataFrame:
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    cust_region = {c: r2name[n2r[n]]
                   for c, n in zip(cust["c_custkey"], cust["c_nationkey"])}
    lookup_ref = ray.put(cust_region)

    def partial(b: pa.Table) -> pa.Table:
        from pawpaw_ray.state.broadcast import cached_get
        lut = cached_get(lookup_ref)  # deserialized once per worker process
        df = b.to_pandas()
        df["r_name"] = df["o_custkey"].map(lut)
        df["revenue_cents"] = _cents(df["o_totalprice"])
        agg = (df.groupby("r_name", sort=False)
                 .agg(revenue_cents=("revenue_cents", "sum"),
                      n_orders=("o_totalprice", "size"))
                 .reset_index())
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
                .map_batches(partial, batch_format="pyarrow")
                .to_pandas())
    out = (partials.groupby("r_name", sort=False).sum().reset_index()
           .sort_values("r_name").reset_index(drop=True))
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# generic semi / anti join + per-key top-k (engine-new distributed operators)
# ---------------------------------------------------------------------------

# Above this many bytes of distinct right-side keys, membership moves from
# a broadcast isin filter to Ray's native shuffle semi/anti join.
BROADCAST_KEY_BYTES = 64 * 2**20


def _bloom_hashes(vals: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 over the fixed
    siphash (Kirsch-Mitzenmacher: two base hashes give k independent-
    enough probes; h2 forced odd so every probe stride hits all of a
    power-of-two table)."""
    h = pd.util.hash_array(np.asarray(vals, dtype=object))
    h1 = h >> np.uint64(32)
    h2 = (h | np.uint64(1)) & np.uint64(0xFFFFFFFF)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def build_bloom(keys_ds, on: str, m_bits: int, k: int = 7,
                reg_chunks: int = 16):
    """Bloom filter over a key Dataset, built fully distributed: per-batch
    bit arrays are split into ``reg_chunks`` chunk rows and OR-merged per
    chunk id (same chunk-row merge shape as the HLL registers), so the
    driver reassembles a fixed number of rows regardless of batch count.
    Returns the packed bit array (uint8, ``m_bits/8`` bytes)."""
    if m_bits % (8 * reg_chunks):
        raise ValueError("m_bits must be divisible by 8*reg_chunks")

    def chunk_rows(b: pa.Table) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        vals = b[on].to_numpy(zero_copy_only=False)
        if len(vals):
            pos = _bloom_hashes(vals, m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        parts = bits.reshape(reg_chunks, -1)
        return pd.DataFrame({
            "chunk": np.arange(reg_chunks, dtype=np.int64),
            "bits": [r.tobytes() for r in parts],
        })

    def chunk_or(g: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack([np.frombuffer(x, dtype=np.uint8)
                          for x in g["bits"]])
        return pd.DataFrame({"chunk": g["chunk"].iloc[:1],
                             "bits": [np.bitwise_or.reduce(stack,
                                                           axis=0).tobytes()]})

    parts = (keys_ds.map_batches(chunk_rows, batch_format="pyarrow")
             .groupby("chunk").map_groups(chunk_or, batch_format="pandas")
             .to_pandas().sort_values("chunk"))
    return np.concatenate([np.frombuffer(x, dtype=np.uint8)
                           for x in parts["bits"]])


def _bloom_member(vals: np.ndarray, bits: np.ndarray, k: int) -> np.ndarray:
    """Vectorized membership probe: True = POSSIBLY present (false
    positives at the filter's design rate), False = definitely absent."""
    if not len(vals):
        return np.zeros(0, dtype=bool)
    pos = _bloom_hashes(vals, len(bits) * 8, k)
    probes = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probes.all(axis=1)


def semi_join(left_ds, right_ds, on: str, anti: bool = False,
              broadcast_bytes: int = BROADCAST_KEY_BYTES,
              num_partitions: int | None = None,
              bloom_bits: int | None = None):
    """Distributed semi join (``anti=False``: keep left rows whose ``on``
    key appears on the right) / anti join (``anti=True``: keep the rest).

    The right side is reduced map-side to per-block distinct keys FIRST —
    only the key column ever leaves the right side, whatever its payload
    width.  The materialized partial-key table's metadata ``size_bytes()``
    picks the strategy (same gate discipline as
    ``curation.eval_shingle_set``, no driver ``count()`` sniffs):

    * under the gate (the common dimension-filter case): the driver merges
      the partials into ONE sorted array, ``ray.put`` once, and the left
      side streams through a vectorized ``np.isin`` membership filter —
      the big side is never shuffled (at 100 TB the left is the corpus).
    * over the gate: Ray's native hash ``left_semi`` / ``left_anti`` join
      against the per-block-distinct key table — both sides shuffle, the
      right as bare keys.

    Exact membership on raw key values in both paths (no 64-bit key
    hashing — a join operator must not have false positives).

    ``bloom_bits`` (native path only): build a Bloom filter over the
    right keys (distributed OR-merge, ``bloom_bits/8`` broadcast bytes)
    and prefilter the LEFT before the shuffle — Bloom-negative rows are
    DEFINITE non-members, so for semi they drop immediately and for anti
    they pass immediately; only the Bloom-positive sliver (members + the
    design-rate false positives) enters the exact native join, whose
    verdict is unchanged.  Exactness preserved, shuffle volume cut to
    ~|members| x (1 + fp_rate); the filter itself must fit the broadcast
    budget (bits/8 bytes — 128 MB covers ~10^8 keys at 1% fp with k=7),
    which is the point: it fits long after the raw key set does not.
    """
    import ray

    def key_batch(b: pa.Table) -> pa.Table:
        col = b[on]
        return pa.table({on: pc.unique(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)})

    parts = (right_ds.map_batches(key_batch, batch_format="pyarrow")
             .materialize())

    if parts.size_bytes() > broadcast_bytes:
        if num_partitions is None:
            from pawpaw_ray.tuning import shuffle_buckets
            num_partitions = shuffle_buckets(multiplier=1)
        distinct = parts.groupby(on).map_groups(
            lambda g: g.iloc[:1], batch_format="pandas")

        if bloom_bits:
            bloom_ref = ray.put(build_bloom(parts, on, bloom_bits))

            def bloom_split(b: pa.Table, keep_possible: bool) -> pa.Table:
                from pawpaw_ray.state.broadcast import cached_get
                bits = cached_get(bloom_ref)
                possible = _bloom_member(
                    b[on].to_numpy(zero_copy_only=False), bits, 7)
                return b.filter(pa.array(possible if keep_possible
                                         else ~possible))

            maybe = left_ds.map_batches(
                lambda b: bloom_split(b, True), batch_format="pyarrow")
            joined = maybe.join(
                distinct, join_type="left_anti" if anti else "left_semi",
                num_partitions=num_partitions, on=(on,))
            if not anti:
                return joined
            definite = left_ds.map_batches(
                lambda b: bloom_split(b, False), batch_format="pyarrow")
            return joined.union(definite)

        return left_ds.join(distinct,
                            join_type="left_anti" if anti else "left_semi",
                            num_partitions=num_partitions, on=(on,))

    arrs = [b[on].to_numpy(zero_copy_only=False)
            for b in parts.iter_batches(batch_format="pyarrow")]
    keys = (np.unique(np.concatenate(arrs)) if arrs
            else np.empty(0, dtype=np.int64))
    keys_ref = ray.put(keys)

    def member_filter(b: pa.Table) -> pa.Table:
        from pawpaw_ray.state.broadcast import cached_get
        ks = cached_get(keys_ref)
        hit = np.isin(b[on].to_numpy(zero_copy_only=False), ks)
        return b.filter(pa.array(~hit if anti else hit))

    return left_ds.map_batches(member_filter, batch_format="pyarrow")


def group_topk(ds, key: str, order_col: str, k: int,
               ascending: bool = False, tie_col: str | None = None,
               n_buckets: int | None = None):
    """Per-key top-k rows by ``order_col`` (ties broken by ``tie_col``
    ascending — REQUIRED for determinism when order values can repeat),
    with a 1-based ``rank`` column.  All other columns pass through.

    Map-side partial top-k per batch (one vectorized sort + grouped head,
    no per-key loop) means at most ``k x distinct-keys-per-batch`` rows
    enter the shuffle; the bucketed final reduce repeats the same kernel.
    SQL: ``row_number() OVER (PARTITION BY key ORDER BY ...) <= k``.
    """
    from pawpaw_ray.tuning import hash_bucket, shuffle_buckets
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)
    by = [key, order_col] + ([tie_col] if tie_col else [])
    asc = [True, ascending] + ([True] if tie_col else [])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(by, ascending=asc, kind="mergesort")
               .groupby(key, sort=False).head(k))
        return out

    def partial_batch(b: pa.Table) -> pd.DataFrame:
        df = partial_topk(b.to_pandas())
        df["gbucket"] = hash_bucket(df[key].to_numpy(), n_buckets)
        return df

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = partial_topk(g.drop(columns=["gbucket"]))
        out["rank"] = out.groupby(key, sort=False).cumcount() + 1
        return out

    return (ds.map_batches(partial_batch, batch_format="pyarrow")
            .groupby("gbucket").map_groups(final_topk,
                                           batch_format="pandas"))


def pivot_counts(ds, key: str, cat_col: str, categories: tuple,
                 n_buckets: int | None = None):
    """Pivot/crosstab counts: one row per ``key`` with an ``n_<cat>``
    int64 column per FIXED category (wide schemas must be static in a
    distributed plan — an unknown category set would make the block schema
    data-dependent; values outside ``categories`` are ignored).

    Map-side wide partials (one grouped ``unstack`` per batch — the
    shuffle moves one wide row per key per batch, not events), bucketed
    column-sum merge.  SQL: ``count(*) FILTER (WHERE cat = c)`` per c.
    """
    from pawpaw_ray.tuning import hash_bucket, shuffle_buckets
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)
    cols = [f"n_{c}" for c in categories]

    def partials(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                           "_c": b[cat_col].to_numpy(zero_copy_only=False)})
        w = (df[df["_c"].isin(categories)]
             .groupby([key, "_c"], sort=False).size().unstack("_c")
             .reindex(columns=list(categories), fill_value=0)
             .fillna(0).astype(np.int64))
        w.columns = [f"n_{c}" for c in w.columns]
        w = w.reset_index()
        w["pbucket"] = hash_bucket(w[key].to_numpy(), n_buckets)
        return w

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key, sort=False)[cols].sum().reset_index()
        out[cols] = out[cols].astype(np.int64)
        return out

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("pbucket").map_groups(merge, batch_format="pandas"))


def distinct_count(ds, key: str, val_col: str,
                   out_col: str = "n_distinct",
                   n_buckets: int | None = None):
    """Exact per-key COUNT(DISTINCT val): per-batch (key, val) dedup
    shrinks the exchange to distinct pairs per batch, then each bucket
    deduplicates across batches and counts per key — all vectorized
    (``drop_duplicates`` + grouped size), never a per-key set in Python.
    """
    from pawpaw_ray.tuning import hash_bucket, shuffle_buckets
    n_buckets = n_buckets or shuffle_buckets(multiplier=1)

    def partials(b: pa.Table) -> pd.DataFrame:
        df = (pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                            val_col: b[val_col].to_numpy(zero_copy_only=False)})
              .drop_duplicates())
        df["dbucket"] = hash_bucket(df[key].to_numpy(), n_buckets)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([key, val_col])
        out = d.groupby(key, sort=False).size().rename(out_col).reset_index()
        out[out_col] = out[out_col].astype(np.int64)
        return out

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("dbucket").map_groups(merge, batch_format="pandas"))


# ---------------------------------------------------------------------------
# approximate distinct count (HyperLogLog — the scale path next to the
# exact distinct_count above)
# ---------------------------------------------------------------------------

def _hll_rho(h: np.ndarray, p: int) -> np.ndarray:
    """Per-hash HLL rank: 1 + leading zeros of the value left of the
    register index bits, capped at ``64 - p + 1``.  Integer-only bit
    search — a float ``log2`` detour can mis-floor near powers of two for
    >53-significant-bit values, which would silently change estimates
    between platforms."""
    w = h << np.uint64(p)
    v = w.copy()
    hb = np.zeros(len(w), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        hb[m] += s
        v[m] >>= np.uint64(s)
    rho = np.where(w == np.uint64(0), np.int64(65), 64 - hb)
    return np.minimum(rho, 64 - p + 1).astype(np.int64)


def _hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate (Flajolet et al. 2007) with the
    small-range linear-counting correction; 64-bit hashes make the
    large-range correction unnecessary.

    The harmonic sum is accumulated as an EXACT integer (Σ 2^(64-r),
    ranks never exceed 64) followed by ONE shared float expression —
    float summation order is non-associative, so a np.sum here and a
    sequential loop in an independent reimplementation could disagree in
    the last ulp and round to different integers at .5 boundaries."""
    import math

    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    s_int = int(sum(1 << (64 - int(r)) for r in regs))
    e = alpha * m * m * 18446744073709551616.0 / s_int
    if e <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            e = m * math.log(m / zeros)
    return int(round(e))


def _hll_regs_batch(vals: np.ndarray, p: int) -> np.ndarray:
    h = pd.util.hash_array(np.asarray(vals, dtype=object))
    regs = np.zeros(1 << p, dtype=np.uint8)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    np.maximum.at(regs, idx, _hll_rho(h, p).astype(np.uint8))
    return regs


def approx_distinct(ds, col: str, key: str | None = None, p: int = 12,
                    out_col: str = "n_approx", n_buckets: int | None = None,
                    reg_chunks: int = 16):
    """Approximate COUNT(DISTINCT col) via HyperLogLog — the sketch path
    for cardinalities where the exact ``distinct_count`` shuffle (one row
    per distinct pair) is itself the bottleneck.  Standard error
    ~1.04/sqrt(2^p) (~1.6% at p=12); the estimate is DETERMINISTIC (fixed
    siphash key via ``pd.util.hash_array``, integer-only rank extraction),
    so it is block-count-invariant and replayable by an independent
    single-process reimplementation of the same spec.

    * ``key=None``: one global estimate.  Per-batch register arrays are
      split into ``reg_chunks`` chunk rows and merged per chunk id with
      vectorized elementwise max — the merge is distributed and the driver
      reassembles ``reg_chunks`` rows, never one row per batch.
    * ``key=...``: per-key estimates.  Per-batch per-key register blobs
      (2^p bytes per (batch, key)) merge in a bucketed groupby; choose a
      smaller ``p`` when keys are many — register memory is the classic
      HLL space/accuracy dial.

    Returns a pandas DataFrame: ``(n_approx, p)`` or ``(key, n_approx)``.
    """
    from pawpaw_ray.tuning import hash_bucket, shuffle_buckets
    m = 1 << p

    if key is None:
        def chunk_rows(b: pa.Table) -> pd.DataFrame:
            regs = _hll_regs_batch(b[col].to_numpy(zero_copy_only=False), p)
            parts = regs.reshape(reg_chunks, m // reg_chunks)
            return pd.DataFrame({
                "chunk": np.arange(reg_chunks, dtype=np.int64),
                "regs": [r.tobytes() for r in parts],
            })

        def chunk_max(g: pd.DataFrame) -> pd.DataFrame:
            stack = np.stack([np.frombuffer(x, dtype=np.uint8)
                              for x in g["regs"]])
            return pd.DataFrame({"chunk": g["chunk"].iloc[:1],
                                 "regs": [stack.max(axis=0).tobytes()]})

        parts = (ds.map_batches(chunk_rows, batch_format="pyarrow")
                 .groupby("chunk").map_groups(chunk_max,
                                              batch_format="pandas")
                 .to_pandas().sort_values("chunk"))
        regs = np.concatenate([np.frombuffer(x, dtype=np.uint8)
                               for x in parts["regs"]])
        return pd.DataFrame({out_col: [np.int64(_hll_estimate(regs))],
                             "p": [np.int64(p)]})

    n_buckets = n_buckets or shuffle_buckets(multiplier=1)

    def key_regs(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                           "_v": b[col].to_numpy(zero_copy_only=False)})
        rows_k, rows_r = [], []
        for kv, grp in df.groupby(key, sort=False):
            rows_k.append(kv)
            rows_r.append(_hll_regs_batch(grp["_v"].to_numpy(), p).tobytes())
        out = pd.DataFrame({key: rows_k, "regs": rows_r})
        out["hbucket"] = hash_bucket(out[key].to_numpy(), n_buckets)
        return out

    def key_merge(g: pd.DataFrame) -> pd.DataFrame:
        rows_k, rows_n = [], []
        for kv, grp in g.groupby(key, sort=False):
            stack = np.stack([np.frombuffer(x, dtype=np.uint8)
                              for x in grp["regs"]])
            rows_k.append(kv)
            rows_n.append(np.int64(_hll_estimate(stack.max(axis=0))))
        return pd.DataFrame({key: rows_k, out_col: rows_n})

    return (ds.map_batches(key_regs, batch_format="pyarrow")
            .groupby("hbucket").map_groups(key_merge,
                                           batch_format="pandas"))
