"""Streaming demo: availableNow streaming result == batch result."""

from __future__ import annotations

import os
import shutil


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    from linkgraph.streaming import run_windowed_counts_once, windowed_event_counts

    src = "/root/testdata/sf0.001/events.parquet"
    # stage as a directory of parquet files (streaming source needs a dir)
    stage = str(tmp_path / "events")
    os.makedirs(stage, exist_ok=True)
    spark.read.parquet(src).repartition(3).write.mode("overwrite").parquet(stage)

    batch = (
        windowed_event_counts(spark.read.parquet(stage))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    streamed = (
        run_windowed_counts_once(spark, stage)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert batch.equals(streamed)
    assert len(batch) > 0


def _sessions_pdf(df):
    pdf = (
        df.toPandas()
        .sort_values(["user_id", "session_no"])
        .reset_index(drop=True)
    )
    for c in ("session_start", "session_end"):
        pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization == batch window sessionization
    for every CLOSED session (a user's final session stays open in state),
    fed as two in-order micro-batch runs resuming from the stream
    checkpoint."""
    import pandas as pd

    from linkgraph.streaming import (
        run_sessionize_stream_once,
        sessionize_events,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cut = "2024-01-15"
    stage = str(tmp_path / "events_sess")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    # batch 1: first half by event time
    events.filter(f"ts < '{cut}'").coalesce(1).write.mode("overwrite").parquet(stage)
    got1 = _sessions_pdf(run_sessionize_stream_once(spark, stage, out, ckpt))
    # batch 2: the rest arrives later (event-time order across files);
    # the second run resumes from the checkpoint and processes only it
    events.filter(f"ts >= '{cut}'").coalesce(1).write.mode("append").parquet(stage)
    streamed = _sessions_pdf(run_sessionize_stream_once(spark, stage, out, ckpt))

    batch = _sessions_pdf(sessionize_events(events))
    # closed sessions only: drop each user's last (max session_no) session
    last = batch.groupby("user_id")["session_no"].transform("max")
    closed = batch[batch["session_no"] != last].reset_index(drop=True)

    assert len(streamed) > 0
    pd.testing.assert_frame_equal(
        streamed.astype({"n_events": "int64", "session_no": "int64"}),
        closed.astype({"n_events": "int64", "session_no": "int64"}),
        check_dtype=False,
    )
    # and at least one session must have been closed ACROSS the two runs
    # (state carried over the checkpoint restart)
    assert len(streamed) > len(got1)


def test_incremental_edge_ingest_matches_batch_build(spark, tmp_path):
    """Continuous-crawl ingest: pages arriving as streaming micro-batches
    (including a RE-CRAWL of existing urls with different outlinks) produce,
    via the append-only pair log + latest-crawl view, exactly the pair set
    the batch pipeline (latest_snapshot -> extract_link_pairs) computes on
    the union of all pages. Second run resumes from the stream checkpoint."""
    import datetime

    from pyspark.sql import functions as F

    from linkgraph.build import extract_link_pairs, latest_snapshot
    from linkgraph.streaming import current_edge_pairs, run_edge_ingest_once
    from linkgraph.synth import gen_pages

    pages1 = gen_pages(spark, 60)
    # re-crawl 5 of the urls one day later with replaced outlinks
    targets = [r["url"] for r in pages1.select("url").limit(8).collect()]
    recrawl_rows = []
    for i, u in enumerate(targets[:5]):
        links = "".join(
            f'<a href="{t}">x</a>' for t in (targets[5:], targets[6:])[i % 2]
        )
        recrawl_rows.append(
            (
                u,
                datetime.datetime(2024, 6, 1, 12, 0, i),
                f"<html><body>{links}</body></html>".encode(),
                "",
                "en",
            )
        )
    pages2 = spark.createDataFrame(
        recrawl_rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    stage = str(tmp_path / "pages_stream")
    out = str(tmp_path / "pairs_log")
    ckpt = str(tmp_path / "ingest_ckpt")
    pages1.coalesce(1).write.mode("overwrite").parquet(stage)
    log1 = run_edge_ingest_once(spark, stage, out, ckpt)
    n1 = log1.count()
    pages2.coalesce(1).write.mode("append").parquet(stage)
    log2 = run_edge_ingest_once(spark, stage, out, ckpt)
    assert log2.count() > n1  # checkpoint resume processed ONLY the new file

    got = {
        (r["src_url"], r["dst_url"])
        for r in current_edge_pairs(log2).collect()
    }
    all_pages = pages1.unionByName(pages2)
    want = {
        (r["src_url"], r["dst_url"])
        for r in extract_link_pairs(latest_snapshot(all_pages))
        .select("src_url", "dst_url")
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0
    # the re-crawl REPLACED outlinks: at least one original pair is gone
    orig = {
        (r["src_url"], r["dst_url"])
        for r in extract_link_pairs(pages1).select("src_url", "dst_url").distinct().collect()
        if r["src_url"] in set(targets[:5])
    }
    assert orig - got, "re-crawl did not replace any pair"

    # a page that goes DEAD (zero-link re-crawl) must lose ALL its edges:
    # the explode_outer tombstone row carries the newer warc_ts into the
    # latest-crawl view (a plain explode would leave the stale edges alive)
    dead_url = targets[5]
    assert any(s == dead_url for s, _ in got), "precondition: dead page had edges"
    pages3 = spark.createDataFrame(
        [(dead_url, datetime.datetime(2024, 6, 2), b"<html><body>gone</body></html>", "", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    pages3.coalesce(1).write.mode("append").parquet(stage)
    log3 = run_edge_ingest_once(spark, stage, out, ckpt)
    got3 = {
        (r["src_url"], r["dst_url"]) for r in current_edge_pairs(log3).collect()
    }
    assert not any(s == dead_url for s, _ in got3), "dead page's edges survived"
    assert got3 == {p for p in got if p[0] != dead_url}


def test_edge_ingest_timestamp_tie_matches_batch(spark, tmp_path):
    """Two crawls of one url with the SAME warc_ts: both paths must pick
    the same winner (md5(html) DESC — latest_snapshot batch-side, the
    crawl_fp carried in the log stream-side)."""
    import datetime

    from linkgraph.build import extract_link_pairs, latest_snapshot
    from linkgraph.streaming import current_edge_pairs, run_edge_ingest_once

    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    u = "https://tie.example.com/"
    mk = lambda target: f'<html><body><a href="{target}">x</a></body></html>'.encode()
    crawl_a = (u, ts, mk("https://a.example.com/"), "", "en")
    crawl_b = (u, ts, mk("https://b.example.com/"), "", "en")
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    stage = str(tmp_path / "tie_pages")
    spark.createDataFrame([crawl_a], schema).coalesce(1).write.mode("overwrite").parquet(stage)
    spark.createDataFrame([crawl_b], schema).coalesce(1).write.mode("append").parquet(stage)
    log = run_edge_ingest_once(
        spark, stage, str(tmp_path / "tie_pairs"), str(tmp_path / "tie_ckpt")
    )
    got = {(r["src_url"], r["dst_url"]) for r in current_edge_pairs(log).collect()}

    both = spark.createDataFrame([crawl_a, crawl_b], schema)
    want = {
        (r["src_url"], r["dst_url"])
        for r in extract_link_pairs(latest_snapshot(both)).distinct().collect()
    }
    assert got == want and len(got) == 1


def test_edge_ingest_empty_first_poll_returns_empty_log(spark, tmp_path):
    """The ingest poll loop may fire before the crawler lands any file —
    that is an empty pair log, not a PATH_NOT_FOUND crash."""
    import os

    from linkgraph.streaming import run_edge_ingest_once

    stage = str(tmp_path / "pages_empty")
    os.makedirs(stage, exist_ok=True)
    log = run_edge_ingest_once(
        spark, stage, str(tmp_path / "pairs_empty"), str(tmp_path / "ckpt_empty")
    )
    assert log.count() == 0
    assert [f.name for f in log.schema.fields] == [
        "src_url", "warc_ts", "crawl_fp", "dst_url",
    ]


def test_sessionize_null_values_match_batch_and_empty_first_poll(spark, tmp_path):
    """Two crash-path regressions for the sessionize stream:

    1. A NULL ``value`` arrives as NaN under Arrow; the stateful fn must
       match the batch twin's null-skipping ``F.sum`` (zero-fill), not
       poison the session's value_sum to NaN forever.
    2. A first poll over a dir with no event files runs zero micro-batches
       and the sink never creates out_dir — that is an empty sessions
       frame, not PATH_NOT_FOUND (same guard as the edge-ingest twin)."""
    import datetime
    import os

    import pandas as pd

    from linkgraph.streaming import (
        run_sessionize_stream_once,
        sessionize_events,
    )

    # empty first poll: nothing staged yet
    stage = str(tmp_path / "events_nullv")
    os.makedirs(stage, exist_ok=True)
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    first = run_sessionize_stream_once(spark, stage, out, ckpt)
    assert first.count() == 0
    assert [f.name for f in first.schema.fields] == [
        "user_id", "session_no", "session_start", "session_end",
        "n_events", "value_sum",
    ]

    # user 1: session A has one NULL among real values; a >6h gap then
    # closes it. user 2: an ALL-NULL session closed the same way (stream
    # reads 0.0 where batch reads NULL — the one documented divergence).
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    s = lambda m: t0 + datetime.timedelta(minutes=m)
    late = t0 + datetime.timedelta(hours=12)
    rows = [
        (1, 1, s(0), 2.5), (2, 1, s(10), None), (3, 1, s(20), 1.5),
        (4, 2, s(0), None), (5, 2, s(5), None),
        (6, 1, late, 9.0), (7, 2, late, 9.0),  # openers that close A
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    events.coalesce(1).write.mode("append").parquet(stage)
    streamed = _sessions_pdf(run_sessionize_stream_once(spark, stage, out, ckpt))

    batch = _sessions_pdf(sessionize_events(events))
    last = batch.groupby("user_id")["session_no"].transform("max")
    closed = batch[batch["session_no"] != last].reset_index(drop=True)
    # null-skipping sum: 4.0 for user 1; the all-null session is NULL
    # (NaN once in pandas)
    assert list(closed["value_sum"])[0] == 4.0 and pd.isna(closed["value_sum"].iloc[1])

    assert len(streamed) == 2
    assert streamed["value_sum"].notna().all()  # no NaN poisoning
    # session with >=1 non-null value: exact match with the batch twin
    assert streamed.loc[streamed["user_id"] == 1, "value_sum"].item() == 4.0
    # all-null session: 0.0 vs batch NULL is the documented divergence
    assert streamed.loc[streamed["user_id"] == 2, "value_sum"].item() == 0.0
    pd.testing.assert_frame_equal(
        streamed.drop(columns=["value_sum"]),
        closed.drop(columns=["value_sum"]),
        check_dtype=False,
    )


def test_sessionize_late_event_within_watermark_never_regresses_bounds(spark, tmp_path):
    """A row arriving late but inside the 2h watermark is ADMITTED into the
    stateful sessionizer; assigning it to ``last_us`` unconditionally would
    regress the open session's bounds — emitting an invalid interval
    (session_end < session_start) and mis-computing the next row's gap (an
    on-time follow-up 5h later, within the 6h gap of the TRUE last event,
    would falsely close the session). Late rows must be absorbed with
    clamped bounds: start=min, end=max, counts exact."""
    import datetime as dt

    import pandas as pd

    from linkgraph.streaming import EVENTS_SCHEMA, run_sessionize_stream_once

    def write_batch(rows, mode):
        spark.createDataFrame(
            [
                (i, dt.datetime(2024, 3, 1) + dt.timedelta(hours=h), 1, "c", 1.0, "{}")
                for i, h in rows
            ],
            EVENTS_SCHEMA,
        ).coalesce(1).write.mode(mode).parquet(stage)

    stage = str(tmp_path / "late_events")
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    # batch 1 (in order): 00:00 then 08:00 — the 8h silence > 6h gap
    # closes s1 and opens s2
    write_batch([(1, 0), (2, 8)], "overwrite")
    run_sessionize_stream_once(spark, stage, out, ckpt)
    # batch 2: 06:30, LATE (1.5h behind the 08:00 max — inside the 2h
    # watermark, so the operator receives it)
    write_batch([(3, 6.5)], "append")
    run_sessionize_stream_once(spark, stage, out, ckpt)
    # batch 3 (on time): 13:00 is 5h after the TRUE last event (08:00) —
    # must NOT close s2; 22:00 is 9h later — closes s2
    write_batch([(4, 13), (5, 22)], "append")
    got = (
        run_sessionize_stream_once(spark, stage, out, ckpt)
        .toPandas()
        .sort_values("session_no")
        .reset_index(drop=True)
    )

    assert (got["session_end"] >= got["session_start"]).all(), got
    expect = pd.DataFrame(
        {
            "session_no": [1, 2],
            "session_start": pd.to_datetime(
                ["2024-03-01 00:00", "2024-03-01 06:30"]
            ),
            "session_end": pd.to_datetime(
                ["2024-03-01 00:00", "2024-03-01 13:00"]
            ),
            "n_events": [1, 3],
        }
    )
    pd.testing.assert_frame_equal(
        got[["session_no", "session_start", "session_end", "n_events"]].astype(
            {"session_no": "int64", "n_events": "int64"}
        ),
        expect,
        check_dtype=False,
    )
