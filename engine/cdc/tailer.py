"""Binlog/WAL-style changelog tailer (SURVEY.md §2.1 S4).

The changelog is a directory of epoch-partitioned, seq-stamped parquet
files (``log_dir/epoch=<k>/part-*.parquet``). The tailer yields
epoch-bounded Datasets, resuming after the last committed epoch in the
lake manifest (BASELINE.json:6 "binlog/WAL-style change-event tailer",
"resume-from-checkpoint replay").
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from engine.cdc.schema import negotiate


def available_epochs(log_dir: str) -> list[int]:
    return sorted(
        int(n.split("=")[1]) for n in os.listdir(log_dir) if n.startswith("epoch=")
    )


def epoch_files(log_dir: str, epoch: int) -> list[str]:
    edir = os.path.join(log_dir, f"epoch={epoch:05d}")
    return sorted(
        os.path.join(edir, f) for f in os.listdir(edir) if f.endswith(".parquet")
    )


def epoch_schema(log_dir: str, epoch: int) -> pa.Schema:
    """Observed (unified) event schema of one epoch, from parquet footers
    only — cheap driver-side metadata read, no data scan. Feeds the
    schema negotiation layer before the epoch pipeline launches."""
    schema = None
    for f in epoch_files(log_dir, epoch):
        schema = negotiate(schema, pq.read_schema(f))
    if schema is None:
        raise FileNotFoundError(f"no files for epoch {epoch} under {log_dir}")
    return schema


def read_epoch(log_dir: str, epoch: int, parallelism_hint: int | None = None) -> rd.Dataset:
    """Epoch-bounded Dataset of change events (streamed, lazy)."""
    files = epoch_files(log_dir, epoch)
    kw = {}
    if parallelism_hint:
        kw["override_num_blocks"] = max(parallelism_hint, len(files))
    # partitioning=None: the `epoch=<k>` path component is addressing, not
    # a hive-partition column — epoch identity comes from the tailer.
    return rd.read_parquet(files, partitioning=None, **kw)


# ---- pluggable source protocol ---------------------------------------------
#
# replay() consumes any object with this trio — the dir-poll tailer is
# just the default implementation. A socket/binlog connector implements
# the same three methods (seal = the upstream transaction boundary).


class DirectorySource:
    """The sealed-epoch-directory protocol (default source): an epoch is
    visible once its ``epoch=<k>`` directory exists — producers stage
    elsewhere and ``os.rename`` it in (atomic on POSIX)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def available_epochs(self) -> list[int]:
        return available_epochs(self.log_dir)

    def epoch_schema(self, epoch: int) -> pa.Schema:
        return epoch_schema(self.log_dir, epoch)

    def read_epoch(self, epoch: int, parallelism_hint: int | None = None) -> rd.Dataset:
        return read_epoch(self.log_dir, epoch, parallelism_hint)

    def __repr__(self) -> str:  # lineage/debug labels
        return f"DirectorySource({self.log_dir!r})"


class MemorySource:
    """In-process iterator/queue source: a producer thread appends Arrow
    tables to an epoch and seals it; the replay loop tails sealed epochs
    exactly as it tails a directory log. Thread-safe (the follow loop
    polls from another thread). This is the embedding/test source — a
    real streaming connector (socket, binlog) follows the same shape:
    buffer, seal on the upstream boundary, serve sealed epochs."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._open: dict[int, list[pa.Table]] = {}
        self._sealed: dict[int, list[pa.Table]] = {}

    def append(self, epoch: int, table: pa.Table) -> None:
        with self._lock:
            if epoch in self._sealed:
                raise ValueError(f"epoch {epoch} already sealed")
            self._open.setdefault(epoch, []).append(table)

    def seal(self, epoch: int) -> None:
        with self._lock:
            tables = self._open.pop(epoch, None)
            if tables is None:
                raise ValueError(f"no open epoch {epoch}")
            self._sealed[epoch] = tables

    def available_epochs(self) -> list[int]:
        with self._lock:
            return sorted(self._sealed)

    def epoch_schema(self, epoch: int) -> pa.Schema:
        with self._lock:
            tables = list(self._sealed[epoch])
        schema = None
        for t in tables:
            schema = negotiate(schema, t.schema)
        return schema

    def read_epoch(self, epoch: int, parallelism_hint: int | None = None) -> rd.Dataset:
        with self._lock:
            tables = list(self._sealed[epoch])
        ds = rd.from_arrow(tables)
        if parallelism_hint and parallelism_hint > len(tables):
            ds = ds.repartition(parallelism_hint)
        return ds

    def __repr__(self) -> str:
        return f"MemorySource(sealed={len(self._sealed)})"


class StreamSource:
    """External tail connector (the class-typical "binlog client"): a
    byte stream of line-delimited JSON change events from ANY readable
    file object — a subprocess's stdout, a socket file, a FIFO, a file
    being appended — served through the standard source trio, so
    ``replay(StreamSource(...), lake, follow=True)`` is a live CDC tail
    off an external producer.

    Wire protocol (one UTF-8 JSON object per line):

    - event line — ``{"seq": ..., "op": "I|U|D", <payload columns>...}``
    - seal line  — ``{"__seal__": <epoch:int>}``: the upstream
      transaction boundary. Every event line received since the previous
      seal belongs to this epoch; epoch numbers must be strictly
      increasing (an empty epoch is legal — an idle boundary window).
    - end-of-stream seals NOTHING: events after the last seal are an
      uncommitted tail and are DISCARDED (counted in
      ``tail_discarded``) — an at-least-once producer re-sends them
      after reconnect, and the LWW fold absorbs the duplicates.

    Malformed lines are skipped and counted (``lines_skipped``), never
    fatal — wire noise must not kill a long-running tailer; event-LEVEL
    validation stays where it belongs (the replay validator +
    dead-letter queue).

    A daemon reader thread drains the stream into sealed in-memory
    Arrow epochs (chunked to ``batch_rows`` so Ray gets input blocks).
    Pass ``schema`` for type exactness (JSON inference gives
    int64/float64/string; missing keys become typed nulls — the
    additive-evolution rule). Memory is bounded by seal frequency ×
    replay cadence, exactly like any binlog client's buffer."""

    def __init__(self, stream, schema: pa.Schema | None = None,
                 batch_rows: int = 65536, name: str = "stream"):
        import json
        import threading

        self._mem = MemorySource()
        self._schema = schema
        self._batch_rows = batch_rows
        self._name = name
        self._proc = None
        self.lines_skipped = 0
        self.tail_discarded = 0
        self.done = threading.Event()

        def _table(rows: list[dict]) -> pa.Table:
            if schema is not None:
                return pa.Table.from_pylist(rows, schema=schema)
            return pa.Table.from_pylist(rows)

        def _drain():
            rows: list[dict] = []
            last_epoch = -1
            try:
                for raw in stream:
                    if isinstance(raw, bytes):
                        raw = raw.decode("utf-8", errors="replace")
                    raw = raw.strip()
                    if not raw:
                        continue
                    try:
                        obj = json.loads(raw)
                        if not isinstance(obj, dict):
                            raise ValueError("not an object")
                    except Exception:
                        self.lines_skipped += 1
                        continue
                    k = obj.get("__seal__")
                    if k is not None:
                        k = int(k)
                        if k <= last_epoch:
                            self.lines_skipped += 1  # stale/duplicate seal
                            continue
                        for lo in range(0, max(len(rows), 1), self._batch_rows):
                            self._mem.append(k, _table(rows[lo:lo + self._batch_rows]))
                        self._mem.seal(k)
                        rows = []
                        last_epoch = k
                    else:
                        rows.append(obj)
            finally:
                self.tail_discarded = len(rows)
                self.done.set()

        self._thread = threading.Thread(target=_drain, daemon=True, name=f"tail-{name}")
        self._thread.start()

    @classmethod
    def from_subprocess(cls, cmd: list[str], schema: pa.Schema | None = None,
                        **popen_kw):
        """Spawn ``cmd`` and tail its stdout — the subprocess-connector
        form (e.g. a vendor binlog client printing NDJSON)."""
        import subprocess

        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, **popen_kw)
        src = cls(proc.stdout, schema=schema, name=cmd[0])
        src._proc = proc
        return src

    def available_epochs(self) -> list[int]:
        return self._mem.available_epochs()

    def epoch_schema(self, epoch: int) -> pa.Schema:
        return self._schema if self._schema is not None else self._mem.epoch_schema(epoch)

    def read_epoch(self, epoch: int, parallelism_hint: int | None = None) -> rd.Dataset:
        return self._mem.read_epoch(epoch, parallelism_hint)

    def close(self, timeout: float = 10.0) -> None:
        if self._proc is not None and self._proc.poll() is None:
            self._proc.terminate()
        self._thread.join(timeout=timeout)

    def __repr__(self) -> str:
        return (f"StreamSource({self._name!r}, "
                f"sealed={len(self._mem.available_epochs())})")


class DatasetSource:
    """A single sealed epoch backed by an existing ``ray.data.Dataset``
    (streaming — the dataset is never pulled to the driver). Used by the
    snapshot bootstrap (engine/cdc/bootstrap.py) to feed a full initial
    load through the ordinary epoch machinery, and usable by any embedder
    that already has its change events as a Dataset.

    ``schema`` must be supplied when the dataset is a lazy map chain —
    ``Dataset.schema()`` on such a chain executes the upstream plan
    (CLAUDE.md measured fact), so this source never calls it implicitly
    unless no schema was given."""

    def __init__(self, epoch: int, ds: rd.Dataset, schema: pa.Schema | None = None):
        self._epoch = int(epoch)
        self._ds = ds
        self._schema = schema

    def available_epochs(self) -> list[int]:
        return [self._epoch]

    def epoch_schema(self, epoch: int) -> pa.Schema:
        if epoch != self._epoch:
            raise KeyError(f"DatasetSource holds only epoch {self._epoch}, not {epoch}")
        if self._schema is None:
            s = self._ds.schema()
            self._schema = pa.schema(
                [pa.field(n, t) for n, t in zip(s.names, s.types)]
            )
        return self._schema

    def read_epoch(self, epoch: int, parallelism_hint: int | None = None) -> rd.Dataset:
        if epoch != self._epoch:
            raise KeyError(f"DatasetSource holds only epoch {self._epoch}, not {epoch}")
        return self._ds

    def __repr__(self) -> str:
        return f"DatasetSource(epoch={self._epoch})"


class TransformSource:
    """A changelog source viewed through a per-event transform — the
    primitive behind DERIVED LAKES (engine/cdc/derive.py): replaying
    ``TransformSource(log, fn, schema)`` into its own lake maintains
    fn(events) incrementally under the ordinary machinery (exactly-once
    commits, resume, LWW by the ORIGINAL seq), so expensive per-row
    derivations (signatures, features, embeddings) are computed once per
    CHANGED row, never per analysis run.

    ``fn`` is a pa.Table → pa.Table batch transform that must preserve
    the seq/op/repo/path meta columns (LWW inputs) and emit a FIXED
    output schema (``schema``) — a fixed derived schema also insulates
    the derived lake from upstream payload evolution."""

    def __init__(self, inner, fn, schema: pa.Schema):
        self.inner = as_source(inner)
        self.fn = fn
        self._schema = schema

    def available_epochs(self) -> list[int]:
        return self.inner.available_epochs()

    def epoch_schema(self, epoch: int) -> pa.Schema:
        return self._schema

    def read_epoch(self, epoch: int, parallelism_hint: int | None = None) -> rd.Dataset:
        ds = self.inner.read_epoch(epoch, parallelism_hint)
        return ds.map_batches(self.fn, batch_format="pyarrow")

    def __repr__(self) -> str:
        return f"TransformSource({self.inner!r})"


class SeqBoundSource:
    """A changelog source truncated at an arbitrary ``seq`` position —
    the primitive behind seq-granular point-in-time recovery
    (engine/cdc/replay.py::state_asof). Epochs whose events all lie
    ABOVE the bound are pruned from ``available_epochs`` via parquet
    FOOTER column statistics when the inner source is a directory log
    (no data pages read); surviving epochs filter ``seq <= bound`` per
    batch, so the boundary epoch contributes exactly its prefix."""

    def __init__(self, inner, bound: int):
        self.inner = as_source(inner)
        self.bound = int(bound)

    def _epoch_min_seq(self, epoch: int) -> int | None:
        if not isinstance(self.inner, DirectorySource):
            return None  # unknown — keep the epoch, the filter decides
        lo = None
        for f in epoch_files(self.inner.log_dir, epoch):
            md = pq.ParquetFile(f).metadata
            idx = pq.read_schema(f).names.index("seq")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None  # no stats — keep the epoch
                lo = st.min if lo is None else min(lo, st.min)
        return lo

    def available_epochs(self) -> list[int]:
        out = []
        for e in self.inner.available_epochs():
            lo = self._epoch_min_seq(e)
            if lo is None or lo <= self.bound:
                out.append(e)
        return out

    def epoch_schema(self, epoch: int) -> pa.Schema:
        return self.inner.epoch_schema(epoch)

    def read_epoch(self, epoch: int, parallelism_hint: int | None = None) -> rd.Dataset:
        import pyarrow.compute as pc

        bound = self.bound

        def _cut(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.fill_null(pc.less_equal(t.column("seq"), bound), False)
            )

        return self.inner.read_epoch(epoch, parallelism_hint).map_batches(
            _cut, batch_format="pyarrow"
        )

    def __repr__(self) -> str:
        return f"SeqBoundSource({self.inner!r}, <= {self.bound})"


def as_source(log: "str | DirectorySource | MemorySource"):
    """Normalize replay()'s log argument: a path string becomes the
    directory tailer; anything exposing the source trio passes through."""
    if isinstance(log, str):
        return DirectorySource(log)
    for m in ("available_epochs", "epoch_schema", "read_epoch"):
        if not callable(getattr(log, m, None)):
            raise TypeError(f"changelog source missing {m}(): {log!r}")
    return log
