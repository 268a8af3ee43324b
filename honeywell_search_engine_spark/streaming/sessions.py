"""Sessionization: gap-based user sessions, batch and stateful-streaming.

The reference keeps per-user search history but has no session concept;
this is the custom STATEFUL streaming operator the engine's event tables
call for (SURVEY §2.10 capability row) — the canonical
``applyInPandasWithState`` use case: state that no windowed aggregate can
express (a session's end depends on the NEXT event's timestamp).

Two implementations with one contract:

- ``sessionize`` (batch): gap-and-island via window functions — lag per
  user ordered by (ts, event_id), a new session starts where the gap
  exceeds ``gap_seconds``, the session ordinal is a running sum. ONE
  shuffle on user_id; fully SQL-mirrorable (driver gate
  ``user_sessions``).
- ``sessionize_stream_update`` (streaming): groupBy(user).
  applyInPandasWithState — per-user state carries (last event ts, open
  session ordinal/start/count/value); each micro-batch continues the gap
  chain exactly where the previous batch left it and emits UPDATED rows
  for every session it touched. With per-user ts-ordered arrival the
  latest emission per (user_id, session_id) equals the batch result
  (tested stream == batch over multi-batch file feeds).

At 100 TB/day the state is one tiny tuple per ACTIVE user (closed
sessions leave state immediately), the exact property that makes
sessionization viable as a continuous query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

EPOCH = "2024-01-01"  # gate-comparable µs offsets, like windowed_counts

SESSION_SCHEMA = (
    "user_id long, session_id int, n_events long, "
    "start_us long, end_us long, total_value double"
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_id, n_events, start_us, end_us, total_value) —
    gap-and-island sessionization. Timestamps are emitted as microsecond
    offsets from EPOCH so the DuckDB mirror compares exactly."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{EPOCH} 00:00:00', {ts_col})"
    )
    marked = events.select(
        F.col(user_col).alias("user_id"), "event_id", "value", us.alias("us")
    ).withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(
                Window.partitionBy("user_id").orderBy("us", "event_id")
            ).isNull()
            | (
                F.col("us")
                - F.lag("us").over(
                    Window.partitionBy("user_id").orderBy("us", "event_id")
                )
                > gap_seconds * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_id", F.sum("new_sess").over(w2).cast("int"))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


def _session_state_fn(gap_seconds: int):
    """Builds the applyInPandasWithState function: per-user state tuple
    (last_us, session_id, n_events, start_us, total_value)."""
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.exists:
            last_us, sid, n_ev, start_us, total_v = state.get
        else:
            last_us, sid, n_ev, start_us, total_v = None, 0, 0, 0, 0.0
        touched: dict[int, tuple] = {}
        # concat ALL chunks before sorting — a key's rows may arrive split
        # across Arrow batches; per-chunk sorting would break time order
        chunks = [c for c in pdf_iter if len(c)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(["us", "event_id"])
            for usv, val in zip(pdf["us"].to_numpy(), pdf["value"].to_numpy()):
                usv = int(usv)
                if last_us is None or usv - last_us > gap_us:
                    sid += 1
                    n_ev, start_us, total_v = 0, usv, 0.0
                n_ev += 1
                total_v += float(val)
                last_us = usv
                touched[sid] = (n_ev, start_us, last_us, total_v)
        state.update((last_us, sid, n_ev, start_us, total_v))
        rows = [
            {
                "user_id": int(user_id),
                "session_id": int(s),
                "n_events": int(n),
                "start_us": int(st),
                "end_us": int(en),
                "total_value": round(tv, 6),
            }
            for s, (n, st, en, tv) in sorted(touched.items())
        ]
        yield pd.DataFrame(
            rows
            or {
                "user_id": pd.Series([], dtype="int64"),
                "session_id": pd.Series([], dtype="int32"),
                "n_events": pd.Series([], dtype="int64"),
                "start_us": pd.Series([], dtype="int64"),
                "end_us": pd.Series([], dtype="int64"),
                "total_value": pd.Series([], dtype="float64"),
            }
        )

    return fn


def sessionize_stream_update(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Streaming sessionization in update mode: emits the current
    (user_id, session_id) aggregate whenever a micro-batch touches it.
    Requires per-user ts-ordered arrival across batches (file feeds with
    ordered files satisfy this); the latest emission per key equals the
    batch ``sessionize`` row."""
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{EPOCH} 00:00:00', ts)"
    )
    prepared = events.select(
        "user_id", "event_id", "value", us.alias("us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_state_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType="last_us long, sid int, n_ev long, start_us long, total_v double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    gap_seconds: int = 1800,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain available event files (one file per micro-batch, so per-user
    order across batches follows file order) through the stateful
    sessionizer; append every update emission to parquet. The reader takes
    the LATEST emission per (user_id, session_id)."""
    checkpoint_dir = checkpoint_dir or f"{out_dir}/_checkpoint"
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(events_dir)
    )
    sess = sessionize_stream_update(stream, gap_seconds).withColumn(
        "batch_seq", F.lit(None).cast("long")
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_seq", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{out_dir}/updates")
        )

    q = (
        sess.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def latest_sessions(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold the update stream: newest emission per (user_id, session_id)."""
    upd = spark.read.parquet(f"{out_dir}/updates")
    w = Window.partitionBy("user_id", "session_id").orderBy(F.desc("batch_seq"))
    return (
        upd.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "session_id", "n_events", "start_us", "end_us", "total_value"
        )
        .orderBy("user_id", "session_id")
    )


# --- Spark 4 native stateful API backend (transformWithStateInPandas) -------
# Same contract as sessionize_stream_update, expressed in the newer
# StatefulProcessor API (typed per-key ValueState managed by the engine's
# state store, timer surface available for TTL/eviction policies the
# applyInPandasWithState path can't express). Both backends are tested
# stream == batch on the same multi-batch file feed.


def _make_session_processor(gap_seconds: int):
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "sess",
                "last_us long, sid int, n_ev long, start_us long, total_v double",
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                last_us, sid, n_ev, start_us, total_v = self._state.get()
            else:
                last_us, sid, n_ev, start_us, total_v = None, 0, 0, 0, 0.0
            touched: dict[int, tuple] = {}
            # Concatenate ALL Arrow chunks for the key before sorting —
            # one micro-batch can deliver a key's rows split across several
            # Arrow batches (~10k rows each); sorting per chunk would
            # process events out of time order (round-4 advice,
            # sessions.py:252).
            chunks = [c for c in rows if len(c)]
            if chunks:
                pdf = (
                    pd.concat(chunks, ignore_index=True)
                    if len(chunks) > 1
                    else chunks[0]
                ).sort_values(["us", "event_id"])
                for usv, val in zip(
                    pdf["us"].to_numpy(), pdf["value"].to_numpy()
                ):
                    usv = int(usv)
                    if last_us is None or usv - last_us > gap_us:
                        sid += 1
                        n_ev, start_us, total_v = 0, usv, 0.0
                    n_ev += 1
                    total_v += float(val)
                    last_us = usv
                    touched[sid] = (n_ev, start_us, last_us, total_v)
            self._state.update((last_us, sid, n_ev, start_us, total_v))
            rows_out = [
                {
                    "user_id": int(user_id),
                    "session_id": int(s),
                    "n_events": int(n),
                    "start_us": int(st),
                    "end_us": int(en),
                    "total_value": round(tv, 6),
                }
                for s, (n, st, en, tv) in sorted(touched.items())
            ]
            yield pd.DataFrame(
                rows_out
                or {
                    "user_id": pd.Series([], dtype="int64"),
                    "session_id": pd.Series([], dtype="int32"),
                    "n_events": pd.Series([], dtype="int64"),
                    "start_us": pd.Series([], dtype="int64"),
                    "end_us": pd.Series([], dtype="int64"),
                    "total_value": pd.Series([], dtype="float64"),
                }
            )

        def close(self) -> None:
            pass

    return SessionProcessor()


def sessionize_stream_tws(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Streaming sessionization on the Spark 4 native stateful API
    (`transformWithStateInPandas`): update-mode emissions identical to
    sessionize_stream_update's (tested against it AND against the batch
    gap-and-island result)."""
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{EPOCH} 00:00:00', ts)"
    )
    prepared = events.select("user_id", "event_id", "value", us.alias("us"))
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_session_processor(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_sessionize_stream_tws(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    gap_seconds: int = 1800,
    checkpoint_dir: str | None = None,
) -> None:
    """run_sessionize_stream with the transformWithStateInPandas backend.

    transformWithState requires the RocksDB state store provider (the
    HDFS-backed default does not implement the TWS column families);
    set per-query here, restored after the drain. Runtime dependency:
    the TWS state protocol needs the `protobuf` python package (shipped
    on real clusters with pyspark[connect]; absent in this sandbox, so
    the stream==batch test for this backend is importorskip-gated —
    tests/test_sessions.py::test_tws_sessionize_equals_batch)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    checkpoint_dir = checkpoint_dir or f"{out_dir}/_checkpoint"
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(events_dir)
    )
    sess = sessionize_stream_tws(stream, gap_seconds)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_seq", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{out_dir}/updates")
        )

    try:
        q = (
            sess.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def run_sessionize_tws_shim(
    spark: SparkSession,
    file_paths: list,
    out_dir: str,
    gap_seconds: int = 1800,
    chunk_rows: int = 0,
    shuffle: bool = False,
) -> None:
    """In-process harness for the TWS SessionProcessor: emulates the
    transformWithStateInPandas driver contract — init(handle), engine-scoped
    per-key ValueState, handleInputRows over an ITERATOR of Arrow-sized
    pandas chunks — without the protobuf state protocol the real backend
    speaks (the python `protobuf` package is absent in this sandbox; the
    real path stays env-gated in tests/test_sessions.py). Each input file is
    one micro-batch (AvailableNow analog); emissions append to
    `{out_dir}/updates` with batch_seq, so `latest_sessions()` reads both
    backends identically.

    `chunk_rows>0` splits each key's batch rows into chunks of that size
    and `shuffle=True` deterministically permutes them first — together
    they stress the multi-chunk concat-and-sort path (a key's rows arriving
    split across Arrow batches, out of time order per chunk)."""
    import pandas as pd

    class _ShimValueState:
        def __init__(self, store, handle):
            self._store, self._handle = store, handle

        def exists(self):
            return self._handle.current_key in self._store

        def get(self):
            return self._store[self._handle.current_key]

        def update(self, v):
            self._store[self._handle.current_key] = tuple(v)

    class _ShimHandle:
        def __init__(self):
            self._stores: dict = {}
            self.current_key = None

        def getValueState(self, name, schema):
            return _ShimValueState(self._stores.setdefault(name, {}), self)

    proc = _make_session_processor(gap_seconds)
    handle = _ShimHandle()
    proc.init(handle)
    us_expr = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{EPOCH} 00:00:00', ts)"
    )
    out_frames = []
    for seq, path in enumerate(file_paths):
        pdf = (
            spark.read.parquet(path)
            .select("user_id", "event_id", "value", us_expr.alias("us"))
            .toPandas()
        )
        for key, grp in pdf.groupby("user_id", sort=True):
            if shuffle:
                grp = grp.sample(frac=1.0, random_state=seq + 1)
            if chunk_rows and len(grp) > chunk_rows:
                chunks = [
                    grp.iloc[i : i + chunk_rows]
                    for i in range(0, len(grp), chunk_rows)
                ]
            else:
                chunks = [grp]
            handle.current_key = int(key)
            for out in proc.handleInputRows((int(key),), iter(chunks), None):
                if len(out):
                    out = out.copy()
                    out["batch_seq"] = seq
                    out_frames.append(out)
    proc.close()
    upd = pd.concat(out_frames, ignore_index=True)
    spark.createDataFrame(
        upd, schema=SESSION_SCHEMA + ", batch_seq long"
    ).write.mode("append").parquet(f"{out_dir}/updates")
