"""Custom source via the Python Data Source API (Spark 4) — the extension
point for reading systems Spark has no built-in connector for.

``SyntheticDocsDataSource`` generates a deterministic document corpus:
every value is pure integer arithmetic on ``doc_id``, so the source is
exactly reproducible (and oracle-checkable from DuckDB ``range()`` with the
same formulas — no files involved on either side).

Scale shape: ``partitions()`` declares the parallel split (one
``InputPartition`` per contiguous id range); Spark schedules one Python
worker task per partition and streams rows back as Arrow batches. A real
connector (REST API, internal KV store, tile server) keeps this exact
structure — partition by shard/page/key-range, yield rows per partition —
and inherits distributed execution without any JVM code.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceWriter, InputPartition,
                                    WriterCommitMessage)

N_DOCS_DEFAULT = 1000
N_PARTITIONS_DEFAULT = 8
LANGS = ("en", "de", "fr")


def _doc(i: int) -> tuple[int, str, int, str]:
    n_tok = i % 5 + 3
    toks = [f"w{(i * 7 + j) % 13}" for j in range(n_tok)]
    return i, LANGS[i % 3], n_tok, " ".join(toks)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", N_DOCS_DEFAULT))
        self.n_parts = int(options.get("partitions", N_PARTITIONS_DEFAULT))

    def partitions(self):
        step = -(-self.n // self.n_parts)
        return [_RangePartition(s, min(s + step, self.n))
                for s in range(0, self.n, step)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _doc(i)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_tokens bigint, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def _make_events_source():
    """Build the streaming source with EVERY class and helper defined in
    closure scope. Unlike batch reader tasks (which run on executors that
    receive the package zip via addPyFile), the streaming source runner is
    a separate driver-side Python worker that unpickles the DataSource
    WITHOUT this package on its path — module-level classes pickle by
    reference and crash it with ModuleNotFoundError. Dynamic classes make
    cloudpickle serialize everything by value, so the runner needs nothing
    but pyspark.

    The reader emits ``batch_size`` deterministic events per micro-batch up
    to ``n`` total. Offsets are plain dicts checkpointed by the engine;
    ``readBetweenOffsets`` replays any committed range bit-identically —
    the property that gives exactly-once on recovery."""
    from pyspark.sql.datasource import (DataSource,
                                        SimpleDataSourceStreamReader)

    def _event(i: int) -> tuple[int, int, str, float]:
        return i, i % 7, ("view", "click", "purchase")[i % 3], float(i % 100) / 4.0

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.batch = int(options.get("batch_size", 25))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            i = start["i"]
            end = min(i + self.batch, self.n)
            return iter([_event(j) for j in range(i, end)]), {"i": end}

        def readBetweenOffsets(self, start, end):
            return iter([_event(j) for j in range(start["i"], end["i"])])

    class SyntheticEventsDataSource(DataSource):
        """Streaming twin of SyntheticDocsDataSource: a rate-limited,
        deterministic event stream — the shape of a custom queue/CDC
        connector written in pure Python (offset management + replay,
        no JVM code)."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_events"

        def schema(self) -> str:
            return ("event_id bigint, user_id bigint, "
                    "event_type string, value double")

        def simpleStreamReader(self, schema):
            return SyntheticEventsStreamReader(self.options)

    return SyntheticEventsDataSource, _event


SyntheticEventsDataSource, _event = _make_events_source()




class _JsonlCommit(WriterCommitMessage):
    """One data file per write task; the driver-side commit sees them all."""

    def __init__(self, path: str, n_rows: int):
        self.path, self.n_rows = path, n_rows


MANIFEST_NAME = "_MANIFEST.json"


def jsonl_manifest_files(path: str) -> list[str]:
    """Authoritative data files of a ``jsonl_sink`` directory: exactly the
    files the last successful commit() recorded in the manifest. Readers
    MUST use this (not a directory glob) — orphan files from retried or
    speculative task attempts may coexist on disk and are not data."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, MANIFEST_NAME)) as f:
        names = _json.load(f)["files"]
    return [_os.path.join(path, n) for n in names]


class JsonlSinkWriter(DataSourceWriter):
    """Batch writer: each task streams its partition's rows into one
    JSON-lines file under ``path`` (unique name per task attempt, so
    speculative/retried attempts never collide). Visibility is decided
    driver-side: ``commit()`` writes a ``_MANIFEST.json`` naming exactly
    the authoritative files (merging the previous manifest in append mode,
    replacing it — and deleting the superseded files — in overwrite mode)
    and sweeps orphan attempt files; ``abort()`` deletes this job's
    attempt files and leaves the previous manifest untouched. Readers go
    through :func:`jsonl_manifest_files`, so a retried attempt or an
    aborted job can never surface as data — the same two-phase protocol
    JVM FileFormatWriter commits use (ADVICE r4 medium).

    Cleanup scope (ADVICE r5): attempt files carry a job-scoped prefix
    (``part-<job_id>-``, minted once driver-side in ``__init__`` and
    shipped to every task in the serialized writer), and an APPEND
    commit sweeps only its own job's orphans — a concurrent append
    job's not-yet-committed attempts, or unrelated files in the
    directory, are never touched, matching how JVM commit protocols
    scope cleanup to the job's staging files. OVERWRITE mode still
    sweeps every file the new manifest does not vouch for (that is
    overwrite's contract: replace the directory's contents), so
    overwrite requires single-writer-per-path — same as JVM
    INSERT OVERWRITE.

    Foreign-orphan GC (ADVICE r6, re-keyed per ADVICE r7): job-scoped
    append sweeping means a job that CRASHED between write() and
    commit() leaves attempt files no later append would ever remove —
    invisible to readers (never in the manifest) but an unbounded disk
    leak on long-lived append paths. Tasks therefore stage attempts in
    a JOB-SCOPED SUBDIRECTORY (``_staging-<job_id>/``); commit renames
    the committed files into the root (atomic, same filesystem) and
    removes its own staging dir. GC is keyed on job liveness, not
    per-file age: a foreign ``_staging-*`` dir is removed only when its
    NEWEST entry (and the dir itself) is older than ``orphan_ttl_sec``
    (default 86400; option on the writer) — a live concurrent appender
    keeps refreshing its staging dir's mtimes with every task file, so
    its in-flight attempts are no longer at risk the moment any single
    file ages past the TTL (the r6 scheme's hazard). The residual
    assumption is the same one JVM staging janitors make: a job does
    not sit idle between its LAST task write and commit for longer
    than the TTL. Root-level foreign ``part-*`` debris from the old
    layout still gets the per-file TTL sweep. ``orphan_ttl_sec=0``
    disables both GCs.

    Concurrency precondition (ADVICE r7): ``commit()``'s manifest
    read-merge-replace is not atomic across PROCESSES — two appenders
    committing simultaneously can lose one job's files from the
    manifest (data safe on disk, but invisible to readers). APPEND
    therefore requires single-writer-per-path just like overwrite:
    serialize concurrent appenders externally (one Spark job at a time
    per sink path), exactly as JVM FileOutputCommitter expects."""

    #: default age (seconds) before a foreign orphan attempt file is GC'd
    ORPHAN_TTL_SEC = 86400.0

    def __init__(self, options, overwrite: bool):
        import uuid as _uuid

        self.path = options["path"]
        self.overwrite = overwrite
        self.orphan_ttl_sec = float(
            options.get("orphan_ttl_sec", self.ORPHAN_TTL_SEC))
        self.job_id = _uuid.uuid4().hex[:12]

    @property
    def _staging(self) -> str:
        import os as _os

        return _os.path.join(self.path, f"_staging-{self.job_id}")

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self._staging, exist_ok=True)
        fn = _os.path.join(
            self._staging, f"part-{self.job_id}-{_uuid.uuid4().hex}.json")
        n = 0
        with open(fn, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fn, n)

    def commit(self, messages):
        import json as _json
        import os as _os
        import shutil as _shutil

        # Promote committed attempt files from this job's staging dir
        # into the root (atomic same-fs rename; uuid names can't
        # collide), THEN publish the manifest that vouches for them.
        for m in messages:
            if m is not None:
                dest = _os.path.join(self.path, _os.path.basename(m.path))
                _os.replace(m.path, dest)
        new_files = sorted(_os.path.basename(m.path) for m in messages
                           if m is not None)
        manifest = _os.path.join(self.path, MANIFEST_NAME)
        prev: list[str] = []
        if not self.overwrite and _os.path.exists(manifest):
            with open(manifest) as f:
                prev = _json.load(f)["files"]
        keep = sorted(set(prev) | set(new_files))
        # Atomic publish: readers see the old manifest or the new one,
        # never a partial file.
        tmp = f"{manifest}.{_os.getpid()}.tmp"
        with open(tmp, "w") as f:
            _json.dump({"files": keep,
                        "n_rows_last_commit": sum(
                            m.n_rows for m in messages
                            if m is not None)}, f)
        _os.replace(tmp, manifest)
        # Sweep scope (ADVICE r5): overwrite replaces the directory's
        # contents, so it may delete anything the new manifest does not
        # vouch for (single-writer-per-path precondition, as with JVM
        # INSERT OVERWRITE); append deletes ONLY this job's own orphan
        # attempt files (retried/speculative tasks), never a concurrent
        # job's in-flight attempts or unrelated files.
        own_prefix = f"part-{self.job_id}-"
        import time as _time
        now = _time.time()
        # This job's staging dir: any file left in it is a retried or
        # speculative attempt the commit messages did not claim.
        _shutil.rmtree(self._staging, ignore_errors=True)
        for name in _os.listdir(self.path):
            if name == MANIFEST_NAME or name in keep:
                continue
            full = _os.path.join(self.path, name)
            if name.startswith("_staging-"):
                if self.overwrite:
                    # Overwrite's contract: replace the directory's
                    # contents (single-writer-per-path precondition).
                    _shutil.rmtree(full, ignore_errors=True)
                elif self.orphan_ttl_sec > 0 and _os.path.isdir(full):
                    # Foreign-staging GC keyed on job LIVENESS (ADVICE
                    # r7): the dir belongs to a crashed job only if
                    # nothing in it has been touched for a full TTL.
                    try:
                        newest = max(
                            [_os.path.getmtime(full)]
                            + [_os.path.getmtime(_os.path.join(full, f))
                               for f in _os.listdir(full)])
                        if now - newest > self.orphan_ttl_sec:
                            _shutil.rmtree(full, ignore_errors=True)
                    except OSError:
                        pass
                continue
            # Root-level sweep: old-layout debris (per-file TTL, ADVICE
            # r6) and overwrite's replace-contents contract.
            stale_foreign = False
            if (not self.overwrite and self.orphan_ttl_sec > 0
                    and name.startswith("part-")
                    and not name.startswith(own_prefix)):
                try:
                    stale_foreign = (
                        now - _os.path.getmtime(full) > self.orphan_ttl_sec)
                except OSError:
                    pass
            if self.overwrite or name.startswith(own_prefix) or stale_foreign:
                try:
                    _os.remove(full)
                except OSError:
                    pass

    def abort(self, messages):
        import shutil as _shutil

        _shutil.rmtree(self._staging, ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    """Custom SINK via the Python Data Source API (Spark 4) — the
    extension shape for writing to systems without a JVM connector (a
    REST ingest endpoint, an internal KV store): one Python task per
    partition, commit-message protocol for exactly-once file visibility."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)


def register_python_sources(spark) -> None:
    """Idempotently register the package's Python data sources."""
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)
