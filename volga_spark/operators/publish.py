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
     so the commit point is a single small-file swap.

ALL path operations (list, rename, pointer swap, manifest write) go through
the Hadoop FileSystem API resolved FROM THE ROOT URI — the same filesystem
Spark writes the parquet to. On ``file://`` and HDFS the directory move and
the pointer rename are metadata operations; on object stores (s3a://, gs://)
the directory "rename" is copy-based, so there the pointer PUT — not the
directory — carries the commit semantics: the staged dir is promoted first
and only the final pointer write makes it visible. A failed audit leaves
the staging dir for inspection and the pointer untouched.

Versions are immutable once published; `read_version`/`read_latest` give
time travel, and `operators/versioning.snapshot_diff` diffs any two.

Scale: the only costs are one write and one read of the NEW version; the
pointer and manifest are O(1). Concurrent publishers race on the pointer
(last-write-wins) — single-writer-per-dataset is the documented contract,
as it is for every pointer-file scheme without a locking service.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

LATEST = "LATEST"


class _HadoopFs:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem resolved from a
    path URI, so publish operates on the SAME filesystem Spark writes to
    (local, HDFS, or an object store) rather than assuming the driver's
    POSIX fs."""

    def __init__(self, spark: SparkSession, any_path: str):
        jvm = spark._jvm
        jsc = spark._jsc
        self._jvm = jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.Path(any_path).getFileSystem(
            self._conf
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def listdir(self, path: str) -> list[str]:
        if not self.exists(path):
            return []
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._p(path))
        ]

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._p(src), self._p(dst)))

    def delete(self, path: str) -> None:
        self._fs.delete(self._p(path), True)

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)  # overwrite=True
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def replace_text(self, path: str, text: str) -> None:
        """Atomically replace `path` with `text` — a reader never sees a
        truncated or empty file.

        On rename-based filesystems this is write-to-temp +
        FileContext.rename(OVERWRITE), the atomic swap. Only on the flat
        object stores (s3/gs/oss: rename is copy-based AND a single PUT is
        already all-or-nothing) does a plain overwrite-create carry the
        commit instead. Unknown schemes get the rename path — a
        hierarchical store we haven't listed (abfs/ofs/...) renames
        atomically, whereas guessing "object store" would reintroduce the
        torn-read window this function exists to close."""
        scheme = (self._fs.getUri().getScheme() or "file").lower()
        if scheme in ("s3", "s3a", "s3n", "gs", "oss", "cos", "swift"):
            self.write_text(path, text)
            return
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        self.write_text(tmp, text)
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._fs.getUri(), self._conf
        )
        opts = self._gateway.new_array(
            self._jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        opts[0] = self._jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(self._p(tmp), self._p(path), opts)

    def read_text(self, path: str) -> str:
        inp = self._fs.open(self._p(path))
        try:
            br = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(inp, "UTF-8")
            )
            lines = []
            line = br.readLine()
            while line is not None:
                lines.append(line)
                line = br.readLine()
            return "\n".join(lines)
        finally:
            inp.close()


def _versions(fs: _HadoopFs, root: str) -> list[int]:
    out = []
    for name in fs.listdir(root):
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def publish_version(
    df: DataFrame,
    root: str,
    checks: list | None = None,
) -> int:
    """Write-audit-publish `df` as the next version under `root`; returns
    the committed version number. Raises (leaving the staged files for
    inspection and LATEST untouched) when the audit fails."""
    from volga_spark.operators.expectations import validate

    spark = df.sparkSession
    fs = _HadoopFs(spark, root)
    fs.mkdirs(root)
    vs = _versions(fs, root)
    version = (vs[-1] + 1) if vs else 1
    stage = f"{root.rstrip('/')}/_staging/v{version}-{uuid.uuid4().hex[:8]}"

    # 1. write
    df.write.mode("errorifexists").parquet(stage)

    # 2. audit the staged FILES, not the input plan
    staged = spark.read.parquet(stage)
    if checks:
        validate(staged, checks, on_fail="raise")  # raises on failure

    # 3. publish: promote the staged dir, then swap the pointer (the
    #    commit). On copy-based-rename stores the dir promotion is not
    #    atomic, which is fine: nothing reads v<N> until the pointer —
    #    the single atomic unit on every fs — names it.
    final = f"{root.rstrip('/')}/v{version}"
    if not fs.rename(stage, final):
        raise IOError(f"failed to promote staged version {stage} -> {final}")
    manifest = {
        "version": version,
        "n_files": len(
            [f for f in fs.listdir(final) if f.endswith(".parquet")]
        ),
        "checks": [c.name for c in (checks or [])],
    }
    fs.write_text(f"{final}/_manifest.json", json.dumps(manifest))
    fs.replace_text(f"{root.rstrip('/')}/{LATEST}", str(version))
    return version


def rollback(root: str, version: int, spark: SparkSession | None = None) -> int:
    """Point LATEST at an older (existing) version — the bad-deploy undo.
    Pure pointer swap (atomic via replace_text); no data moves, the newer
    version dirs stay on disk for inspection or re-rollforward."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("rollback needs an active SparkSession")
    fs = _HadoopFs(spark, root)
    if version not in _versions(fs, root):
        raise FileNotFoundError(f"no published version v{version} under {root}")
    fs.replace_text(f"{root.rstrip('/')}/{LATEST}", str(version))
    return version


def vacuum(
    root: str,
    keep_last: int = 2,
    spark: SparkSession | None = None,
) -> list[int]:
    """Delete version dirs older than the newest `keep_last`, returning the
    versions removed. The version LATEST points at is always kept (so a
    rolled-back pointer never dangles), as are staged dirs (`_staging/` is
    audit evidence — clean it explicitly). Time travel works across the
    kept window only; at 100 TB this is the storage-cost knob: each
    published version is a full copy under plain parquet, so retention is
    a deliberate choice, not a default."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1; got {keep_last}")
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("vacuum needs an active SparkSession")
    fs = _HadoopFs(spark, root)
    vs = _versions(fs, root)
    pinned = set(vs[-keep_last:])
    cur = latest_version(root, spark)
    if cur is not None:
        pinned.add(cur)
    removed = []
    for v in vs:
        if v not in pinned:
            fs.delete(f"{root.rstrip('/')}/v{v}")
            removed.append(v)
    return removed


def latest_version(root: str, spark: SparkSession | None = None) -> int | None:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("latest_version needs an active SparkSession")
    fs = _HadoopFs(spark, root)
    ptr = f"{root.rstrip('/')}/{LATEST}"
    if not fs.exists(ptr):
        return None
    return int(fs.read_text(ptr).strip())


def read_version(spark: SparkSession, root: str, version: int) -> DataFrame:
    return spark.read.parquet(f"{root.rstrip('/')}/v{version}")


def read_latest(spark: SparkSession, root: str) -> DataFrame:
    v = latest_version(root, spark)
    if v is None:
        raise FileNotFoundError(f"no published version under {root}")
    return read_version(spark, root, v)
