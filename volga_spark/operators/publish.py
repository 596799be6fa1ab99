"""Write-audit-publish — versioned dataset commits gated by expectations.

The last mile of the curation pipeline: a corpus version must never become
visible half-written or failing its quality gate. The standard lakehouse
pattern (write-audit-publish, as popularized around Iceberg's staged
commits) on plain parquet:

  1. WRITE the frame to a staging directory under the dataset root
     (``_staging/<version>-<nonce>/``) — full cluster parallelism, nothing
     reader-visible.
  2. AUDIT by reading the STAGED FILES back and running the
     `operators/expectations` suite on them — what was actually written,
     not what the plan intended (catches write-path truncation/codec bugs,
     not just data bugs). One extra scan of the new version only.
  3. PUBLISH by moving the staged dir to ``v<N>/`` and atomically rewriting
     the ``LATEST`` pointer file. Readers resolve ``LATEST`` → version dir,
     so the commit point is a single small-file swap: on a POSIX fs the
     rename is atomic; on an object store the pointer PUT is the atomic
     unit (directory "rename" is copy-based there, which is why the pointer
     — not the directory — carries commit semantics). A failed audit
     leaves the staging dir for inspection and the pointer untouched.

Versions are immutable once published; `read_version`/`read_latest` give
time travel, and `operators/versioning.snapshot_diff` diffs any two.

Scale: the only costs are one write and one read of the NEW version; the
pointer and manifest are O(1). Concurrent publishers race on the pointer
(last-write-wins) — single-writer-per-dataset is the documented contract,
as it is for every pointer-file scheme without a locking service.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from volga_spark.operators.expectations import Check, validate

LATEST = "LATEST"


def _versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def publish_version(
    df: DataFrame,
    root: str,
    checks: list[Check] | None = None,
) -> int:
    """Write-audit-publish `df` as the next version under `root`; returns
    the committed version number. Raises (leaving the staged files for
    inspection and LATEST untouched) when the audit fails."""
    os.makedirs(root, exist_ok=True)
    version = (_versions(root)[-1] + 1) if _versions(root) else 1
    stage = os.path.join(root, "_staging", f"v{version}-{uuid.uuid4().hex[:8]}")

    # 1. write
    df.write.mode("errorifexists").parquet(stage)

    # 2. audit the staged FILES, not the input plan
    spark = df.sparkSession
    staged = spark.read.parquet(stage)
    if checks:
        validate(staged, checks, on_fail="raise")  # raises on failure

    # 3. publish: move dir into place, then swap the pointer (the commit)
    final = os.path.join(root, f"v{version}")
    os.rename(stage, final)
    manifest = {
        "version": version,
        "n_files": len(
            [f for f in os.listdir(final) if f.endswith(".parquet")]
        ),
        "checks": [c.name for c in (checks or [])],
    }
    with open(os.path.join(final, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    tmp_ptr = os.path.join(root, f".{LATEST}.{uuid.uuid4().hex[:8]}")
    with open(tmp_ptr, "w") as fh:
        fh.write(str(version))
    os.replace(tmp_ptr, os.path.join(root, LATEST))  # atomic swap
    return version


def latest_version(root: str) -> int | None:
    ptr = os.path.join(root, LATEST)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def read_version(spark: SparkSession, root: str, version: int) -> DataFrame:
    return spark.read.parquet(os.path.join(root, f"v{version}"))


def read_latest(spark: SparkSession, root: str) -> DataFrame:
    v = latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no published version under {root}")
    return read_version(spark, root, v)
