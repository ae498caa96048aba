"""Stream-processor engine: statement loop with CREATE STREAM re-ingest.

Mirrors the reference engine's task/stream model:

- ``FROM STREAM:name`` binds to a registered input by name or alias,
  case-insensitive (flb_sp.c:162-176 sp_task_to_instance).
- ``FROM TAG:'pattern'`` glob-matches every chunk flowing through the
  engine, whatever input produced it (flb_sp.c:2029-2030 via
  flb_router_match) — including chunks re-ingested by created streams.
- ``CREATE STREAM name WITH (...) AS SELECT ...`` registers the query
  result as a NEW input under alias ``name`` whose records re-enter the
  pipeline tagged with the ``tag`` property, defaulting to the stream
  name (flb_sp_stream.c:35-153; in_stream_processor/sp.c:107-117 tag
  fallback). The ``routable`` property ('true' default) controls
  whether those records reach the router (flb_sp_stream.c:105-112).

Spark-first shape: a "stream" here is a lazily-derived DataFrame; the
re-ingest loop is plan composition, not data movement. CHAINED streams
fuse (STREAM:b over STREAM:a over a base input is one scan — asserted
in tests); a TAG: query unions every registered input, so it scans the
base once per derived-stream branch (linear in stream count, the same
cost the reference pays re-reading each re-ingested chunk). At scale,
persist a hot created stream before fanning many consumers out of it.

Timestamp of re-ingested records (documented divergence): the reference
stamps result chunks with wall-clock flush time. Wall-clock is
nondeterministic and useless for replayable batch/stream jobs, so
row-wise selections KEEP the source ``event_time`` and windowed
aggregates carry ``window_start`` as the new ``event_time`` — the
deterministic analogs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from fluent_bit_spark.sp.parser import SpCommand, parse_sql
from fluent_bit_spark.sp.translate import Translator


@dataclass
class SpStream:
    """A registered input: base source or CREATE STREAM result."""

    df: DataFrame
    tag: str | None  # None: df carries its own tag column
    routable: bool = True


class SpEngine:
    def __init__(
        self,
        ts_col: str = "event_time",
        tag_col: str = "tag",
        presence_col: str | None = None,
    ):
        self.ts_col = ts_col
        self.tag_col = tag_col
        self.presence_col = presence_col
        self._streams: dict[str, SpStream] = {}
        self._snapshots: dict[str, SpCommand] = {}

    # -------------------------------------------------------------- inputs
    def register_input(
        self, name: str, df: DataFrame, routable: bool = True
    ) -> None:
        """Register a base input (an in_* plugin instance analog).

        ``df`` must carry ``tag_col`` and ``ts_col`` columns.
        """
        if name.lower() in self._streams:
            # flb_sp_stream_create: name collision with an existing
            # input instance is an error (flb_sp_stream.c:44-48)
            raise ValueError(f"stream name {name!r} already exists")
        self._streams[name.lower()] = SpStream(df=df, tag=None, routable=routable)

    # ----------------------------------------------------------- execution
    def execute(self, sql: str) -> DataFrame:
        cmd = parse_sql(sql)
        if cmd.kind == "select":
            return self._run_select(cmd)
        if cmd.kind == "create_stream":
            return self._create_stream(cmd)
        if cmd.kind == "create_snapshot":
            return self._create_snapshot(cmd)
        if cmd.kind == "flush_snapshot":
            return self._flush_snapshot(cmd)
        raise ValueError(f"SpEngine.execute: unsupported statement {cmd.kind}")

    def _source_df(self, cmd: SpCommand) -> DataFrame:
        if cmd.source_type == "stream":
            s = self._streams.get(cmd.source.lower())
            if s is None:
                # the reference leaves a task for an unknown stream
                # permanently starved; a silent forever-empty query is
                # a debugging trap in batch, so fail loudly instead
                raise KeyError(f"unknown stream {cmd.source!r}")
            return s.df
        # TAG: sees every chunk in the engine, routable or not
        return self._all_records()

    def _all_records(self) -> DataFrame:
        dfs = [s.df for s in self._streams.values()]
        if not dfs:
            raise ValueError("no inputs registered")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def _run_select(self, cmd: SpCommand, keep_cols: list[str] | None = None) -> DataFrame:
        df = self._source_df(cmd)
        return Translator(
            df, self.ts_col, self.tag_col, self.presence_col, keep_cols
        ).translate(cmd)

    def _create_stream(self, cmd: SpCommand) -> DataFrame:
        name = cmd.stream_name or ""
        if name.lower() in self._streams:
            raise ValueError(f"stream name {name!r} already exists")
        tag = cmd.props.get("tag", name)  # in_stream_processor/sp.c:107-117
        routable = cmd.props.get("routable", "true").lower() not in (
            "false", "off", "no", "0",
        )
        out = self._run_select(cmd, keep_cols=[self.ts_col])
        has_agg = any(k.aggr for k in cmd.keys)
        if has_agg:
            # windowed aggregates: window_start becomes the re-ingested
            # record time; non-windowed batch aggregates have no
            # per-row time — stamp null (deterministic; see module doc)
            ts = (
                F.col("window_start")
                if "window_start" in out.columns
                else F.lit(None).cast("timestamp")
            )
            out = out.withColumn(self.ts_col, ts)
        # re-ingested records carry the stream tag, replacing any
        # selected source tag column (flb_input_log_append under the
        # new instance's tag)
        out = out.withColumn(self.tag_col, F.lit(tag))
        self._streams[name.lower()] = SpStream(df=out, tag=tag, routable=routable)
        return out

    # ----------------------------------------------------------- snapshots
    def _create_snapshot(self, cmd: SpCommand) -> DataFrame:
        """CREATE SNAPSHOT name [WITH(seconds=s)] AS SELECT * FROM ...
        LIMIT n — registers the bounded ring-buffer spec
        (flb_sp_snapshot.c:25-160); nothing materializes until FLUSH."""
        name = (cmd.stream_name or "").lower()
        if name in self._snapshots:
            raise ValueError(f"snapshot {name!r} already exists")
        if cmd.limit is None and "seconds" not in cmd.props:
            raise ValueError(
                "snapshot needs LIMIT n and/or WITH(seconds=s) "
                "(flb_sp_snapshot.c bounded buffer)"
            )
        self._snapshots[name] = cmd
        # the registered spec's buffered view (filtered source)
        return self._snapshot_buffer(cmd)

    def _snapshot_buffer(self, snap: SpCommand) -> DataFrame:
        df = self._source_df(snap)
        tr = Translator(df, self.ts_col, self.tag_col, self.presence_col)
        return df.filter(tr.condition(snap.where))

    def _flush_snapshot(self, cmd: SpCommand) -> DataFrame:
        """FLUSH SNAPSHOT name AS SELECT * FROM <same stream> WHERE
        <flush condition>: every matching record re-emits the buffered
        window preceding it (flb_sp_snapshot.c:162-277), bounded by
        the snapshot's LIMIT records / seconds span."""
        from fluent_bit_spark.operators.snapshot import snapshot_flush

        name = (cmd.stream_name or "").lower()
        snap = self._snapshots.get(name)
        if snap is None:
            raise KeyError(f"unknown snapshot {name!r}")
        buffered = self._snapshot_buffer(snap)
        tr = Translator(buffered, self.ts_col, self.tag_col, self.presence_col)
        cond = tr.condition(cmd.where)
        seconds = float(snap.props["seconds"]) if "seconds" in snap.props else None
        return snapshot_flush(
            buffered,
            cond,
            ts_col=self.ts_col,
            limit=snap.limit,
            seconds=seconds,
        )

    # ------------------------------------------------------------- routing
    def routable_records(self) -> DataFrame:
        """Union of every routable input — what the router sees."""
        dfs = [s.df for s in self._streams.values() if s.routable]
        if not dfs:
            raise ValueError("no routable inputs")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out
