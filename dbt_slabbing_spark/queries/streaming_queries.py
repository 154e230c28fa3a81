"""Streaming corpus entries.

The windowed aggregations have exact batch twins, so they get real
DuckDB oracles (streaming semantics over bounded input == batch
semantics once every window closes). The stateful ops (session windows,
within-watermark dedup, custom state) are not ANSI-SQL-expressible →
rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import jobs
from . import register


@register(
    "stream_hourly_type_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round((sum(value)) * 100.0) / 100.0 + 0.0 AS total_value
    FROM events GROUP BY window_start, event_type
    """,
    "streaming tumbling-window agg (1h windows, 2h watermark) vs its batch twin",
    tags=("streaming",),
)
def stream_hourly_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.hourly_type_counts(spark, sf_dir)


@register(
    "stream_static_enrich",
    """
    SELECT date_trunc('hour', e.ts) AS window_start, c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           round((sum(e.value)) * 100.0) / 100.0 + 0.0 AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY window_start, c.c_mktsegment
    """,
    "stream-static join (event stream enriched by the customer dim "
    "per micro-batch) + tumbling rollup by segment vs its batch twin",
    tags=("streaming", "join"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.stream_static_enrichment(spark, sf_dir)


@register(
    "stream_sliding_user_activity",
    # A 2h/1h sliding window assigns every event to EXACTLY two
    # hourly-aligned windows: floor_hour(ts) and floor_hour(ts) - 1h.
    # The SQL twin materializes both memberships with UNION ALL.
    """
    SELECT window_start, user_bucket, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT date_trunc('hour', ts) AS window_start,
               user_id % 10 AS user_bucket
        FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start,
               user_id % 10 AS user_bucket
        FROM events
    ) GROUP BY window_start, user_bucket
    """,
    "streaming sliding-window agg (2h window / 1h slide)",
    tags=("streaming",),
)
def stream_sliding_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.sliding_user_activity(spark, sf_dir)


@register(
    "stream_session_windows",
    # session_window(30 min) == gaps-and-islands with "new session when
    # gap >= 30:00" — Spark's session window end (last_ts + gap) is
    # EXCLUSIVE, so an event exactly 30:00 later starts a new session.
    # µs precision (epoch_us) so sub-millisecond gaps match too;
    # equivalence proven in test_session_windows_match_batch_sessionizer.
    # session_start is the first event's ts (Spark's session start).
    """
    WITH gapped AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         >= 1800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ), sessions AS (
        SELECT user_id, ts, event_id, value,
               sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gapped
    )
    SELECT min(ts) AS session_start, user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round((sum(value)) * 100.0) / 100.0 + 0.0 AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
    "streaming session windows (30-min gap) per user",
    tags=("streaming", "stateful"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.session_windows(spark, sf_dir)


@register(
    "stream_dedup_counts",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events ORDER BY event_id, ts)
    GROUP BY event_type
    """,
    "dropDuplicatesWithinWatermark on event_id → per-type counts",
    tags=("streaming", "dedup"),
)
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.streaming_dedup(spark, sf_dir)


@register(
    "stream_foreach_batch_totals",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round((sum(value)) * 100.0) / 100.0 + 0.0 AS total_value
    FROM events GROUP BY event_type
    """,
    "foreachBatch → batch_id-partitioned parquet sink with dynamic "
    "overwrite (idempotent under batch replay) → cross-batch rollup",
    tags=("streaming", "sink"),
)
def stream_foreach_batch_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    sink = tempfile.mkdtemp(prefix="foreach_batch_sink_")
    return jobs.foreach_batch_totals(spark, sf_dir, sink)


@register(
    "stream_stateful_levels",
    # The stateful loop emits floor(cum/100)*100 whenever an event raises
    # the floor of the user's running purchase total — i.e. the DISTINCT
    # prefix-floor values, NOT every multiple of 100 (a single event can
    # jump several levels and emits only the one it lands on). Over
    # bounded input processed in (ts, arrival) order that equals this
    # gaps-and-islands twin. Values are all positive and every prefix sum
    # sits ≥0.01 away from a level boundary at sf≤0.1, so cross-engine
    # float accumulation can't flip a floor.
    """
    WITH p AS (
        SELECT user_id, ts, event_id, value,
               sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM events WHERE event_type = 'purchase'
    ), marked AS (
        SELECT user_id, cum,
               coalesce(lag(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
                   AS prev_cum
        FROM p
    )
    SELECT user_id, CAST(CAST(floor(cum / 100) AS BIGINT) * 100 AS BIGINT) AS level
    FROM marked WHERE floor(cum / 100) > floor(prev_cum / 100)
    """,
    "custom stateful operator (applyInPandasWithState): cumulative "
    "purchase-value level crossings; batch-twin SQL oracle",
    tags=("streaming", "stateful"),
)
def stream_stateful_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.stateful_high_value_flags(spark, sf_dir)


@register(
    "stream_stream_interval_join",
    """
    SELECT p.user_id AS user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    """,
    "stream-stream interval join (purchase <- clicks within 1h, per user) "
    "with two-sided watermarks; equals its batch join over bounded input",
    tags=("streaming", "join"),
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.purchase_click_attribution(spark, sf_dir)


@register(
    "stream_stream_left_outer_join",
    # Oracle = batch LEFT join restricted to the same watermark-safe
    # horizon the engine applies (purchases ≥ 4h before max event time):
    # inside that region every unmatched purchase has provably been
    # state-evicted and emitted its null-augmented row, so the stream
    # result equals the batch left join exactly; at the stream's tail
    # the two would legitimately differ (rows still held in state).
    """
    WITH mx AS (
        SELECT least(max(ts) FILTER (event_type = 'click'),
                     max(ts) FILTER (event_type = 'purchase')) AS mx
        FROM events
    )
    SELECT p.user_id AS user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           c.event_id IS NOT NULL AS matched
    FROM events p
    LEFT JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    CROSS JOIN mx
    WHERE p.event_type = 'purchase'
      AND p.ts <= mx.mx - INTERVAL 4 HOURS
    """,
    "stream-stream LEFT OUTER interval join: unmatched purchases emit "
    "null-augmented rows on watermark-driven state eviction; compared "
    "to the batch left join inside the watermark-safe horizon",
    tags=("streaming", "join", "outer"),
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.purchase_click_attribution_outer(spark, sf_dir)


@register(
    "stream_minhash_band_dedup",
    # Oracle states the GLOBAL band-first-wins outcome: a doc is kept
    # iff it is the min doc_id in EVERY one of its 4 band-key groups.
    # The streaming job computes the same thing incrementally (batch
    # registry of claimed bands); doc_id-ordered arrival makes the two
    # forms equal for any micro-batch slicing. Signature/band CTEs
    # mirror dedup_minhash_lsh exactly.
    """
    WITH norm AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
        FROM documents
    ),
    shingle AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
            FROM norm
        )
    ),
    lanes AS (
        SELECT doc_id,
               ('0x' || substr(md5(sh), 1, 8))::BIGINT AS a,
               (('0x' || substr(md5(sh), 9, 8))::BIGINT) | 1 AS b
        FROM shingle
    ),
    minh AS (
        SELECT doc_id, s.seed,
               min((a + s.seed * b) & 4294967295) AS h
        FROM lanes, range(0, 8) s(seed)
        GROUP BY doc_id, s.seed
    ),
    sig AS (
        SELECT doc_id, list(h ORDER BY seed) AS sig FROM minh GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, b.band,
               CAST(sig[2*b.band + 1] AS VARCHAR) || '_' || CAST(sig[2*b.band + 2] AS VARCHAR)
                   AS band_key
        FROM sig, range(0, 4) b(band)
    ),
    firsts AS (
        SELECT band, band_key, min(doc_id) AS first_doc
        FROM banded GROUP BY band, band_key
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bands,
           CAST(sum(CASE WHEN b.doc_id <> f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_bands,
           sum(CASE WHEN b.doc_id <> f.first_doc THEN 1 ELSE 0 END) = 0 AS kept
    FROM banded b
    JOIN firsts f USING (band, band_key)
    GROUP BY b.doc_id
    """,
    "streaming near-dup dedup (band-first-wins): documents replayed "
    "through the custom parquet_replay source in micro-batches, minhash "
    "bands claimed in the state store (applyInPandasWithState keyed by "
    "band) — kept iff first arrival in ALL 4 bands; oracle states the "
    "global closed form",
    tags=("streaming", "dedup", "minhash"),
)
def stream_minhash_band_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="stream_band_dedup_")
    return jobs.streaming_band_dedup(spark, sf_dir, work, rows_per_batch=200)


@register(
    "stream_quality_funnel",
    # Oracle states the GLOBAL closed form of the ingest-time funnel:
    # rule verdicts are stateless (so identical to the batch rules),
    # and doc_id-ordered arrival makes the streaming first-wins claim
    # equal min(doc_id) per normalized-content hash over the RULE
    # SURVIVORS. Rule formulas mirror pipeline_quality_funnel exactly.
    """
    WITH feat AS (
        SELECT doc_id, text,
               string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
        FROM documents
    ),
    rules AS (
        SELECT doc_id, text,
               len(w) >= 20 AS len_keep,
               CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.35 AS rep_keep
        FROM feat WHERE len(w) > 0
    ),
    survivors AS (
        SELECT doc_id,
               min(doc_id) OVER (
                   PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
               ) AS first_doc
        FROM rules WHERE len_keep AND rep_keep
    )
    SELECT r.doc_id,
           CASE WHEN NOT r.len_keep THEN 'length'
                WHEN NOT r.rep_keep THEN 'repetition'
                WHEN r.doc_id <> s.first_doc THEN 'exact_dup'
                ELSE 'kept' END AS verdict
    FROM rules r LEFT JOIN survivors s USING (doc_id)
    """,
    "the pretraining funnel's cheap stages AT INGEST: stateless quality "
    "rules -> state-store exact dedup (first-wins per normalized content "
    "hash, applyInPandasWithState on RocksDB) over the micro-batched "
    "document replay; with stream_minhash_band_dedup this gives the "
    "full funnel an ingest-time shape; oracle states the global closed "
    "form",
    tags=("streaming", "dedup", "quality", "pipeline", "training"),
)
def stream_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="stream_quality_funnel_")
    return jobs.streaming_quality_funnel(spark, sf_dir, work, rows_per_batch=200)


@register(
    "stream_domain_cap",
    # Closed form of the ingest-time cap under doc_id-ordered arrival:
    # a doc is kept iff its rank within its domain (by doc_id) is
    # within the cap — the same rule text_domain_filter applies in
    # batch (there ordered by a quality key; arrival order here).
    """
    SELECT doc_id, source AS domain,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 15 AS kept
    FROM documents
    """,
    "per-domain document cap AT INGEST (first 15 per domain in arrival "
    "order): one state-store counter per domain via "
    "applyInPandasWithState on RocksDB -- the streaming twin of the "
    "domain-curation count cap; oracle states the global closed form",
    tags=("streaming", "domains", "quality", "training"),
)
def stream_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="stream_domain_cap_")
    return jobs.streaming_domain_cap(spark, sf_dir, work, cap=15, rows_per_batch=200)


@register(
    "stream_trending_topk",
    """
    WITH c AS (
        SELECT date_trunc('hour', ts) AS window_start,
               CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY window_start, prop_k
    )
    SELECT window_start, prop_k, n, CAST(rn AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY window_start ORDER BY n DESC, prop_k) AS rn
        FROM c
    ) WHERE rn <= 3
    """,
    "streaming trending-items mart: tumbling hourly counts per "
    "JSON-extracted property maintained by the stream, top-3 rank "
    "applied as a batch window over the emitted mart (count DESC, "
    "key ASC tie-break) vs the batch twin",
    tags=("streaming", "window"),
)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.trending_topk(spark, sf_dir, k=3)


@register(
    "stream_ewma_alert",
    # Global closed form of the ingest-time EWMA monitor under
    # event_id-ordered arrival, replayed as the IDENTICAL integer
    # recursion (nano-units; alpha=0.5 as the half-up integer average)
    # in a recursive CTE: y_1 = x_1 (no alert), y_t = floor((y_{t-1} +
    # x_t + 1) / 2) with alert when |x_t - y_{t-1}| > 50e9 nano-units.
    # The step is written floor((a+b)/2.0), NOT DuckDB's `//`: `//`
    # TRUNCATES toward zero while the job's Python `//` FLOORS, and the
    # two diverge whenever y+x+1 is negative and odd. The double
    # division is exact here (|nano state| ≤ ~1e12 ≪ 2^53).
    """
    WITH RECURSIVE x AS (
        SELECT event_id, user_id,
               CAST(round(value * 1000000000.0) AS BIGINT) AS xn,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY event_id) AS BIGINT) AS rn
        FROM events
    ),
    steps AS (
        SELECT user_id, rn, event_id, xn AS yn, FALSE AS alert
        FROM x WHERE rn = 1
        UNION ALL
        SELECT x.user_id, x.rn, x.event_id,
               CAST(floor((s.yn + x.xn + 1) / 2.0) AS BIGINT) AS yn,
               abs(x.xn - s.yn) > 50000000000 AS alert
        FROM steps s JOIN x ON x.user_id = s.user_id AND x.rn = s.rn + 1
    )
    SELECT event_id, user_id,
           CAST(yn AS DOUBLE) / 1000000000.0 AS ewma, alert
    FROM steps
    """,
    "per-user EWMA anomaly alerts AT INGEST (alpha=0.5, threshold 50): "
    "integer nano-unit state in the state store via "
    "applyInPandasWithState on RocksDB; the oracle replays the exact "
    "integer recursion as a recursive CTE",
    tags=("streaming", "stateful", "drift"),
)
def stream_ewma_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="stream_ewma_alert_")
    return jobs.streaming_ewma_alert(
        spark, sf_dir, work, threshold=50.0, rows_per_batch=2000
    )


@register(
    "stream_manifest_append",
    # The manifest table holds exactly the replayed events (each batch
    # committed once, replays skipped), so the rollup read through the
    # manifest equals the batch aggregate over the raw table —
    # independent of micro-batch slicing.
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round((sum(value)) * 100.0) / 100.0 + 0.0 AS total_value
    FROM events GROUP BY event_type
    """,
    "foreachBatch → manifest-table landing zone: each micro-batch is an "
    "atomic manifest commit keyed by batch_id (exactly-once under "
    "replay; OCC lets maintenance run beside the sink) → rollup read "
    "through the manifest",
    tags=("streaming", "sink", "layout"),
)
def stream_manifest_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="stream_manifest_append_")
    return jobs.streaming_manifest_append(spark, sf_dir, work, rows_per_batch=2000)


@register(
    "stream_pattern_alert",
    # Oracle = the batch pattern gate's SQL verbatim (ts_pattern_v_shape):
    # over the bounded replay processed in event_id order, the stateful
    # tail detector emits exactly the lag/lead windows' trough set.
    """
    WITH s AS (
        SELECT user_id, event_id, value,
               lag(value, 2)  OVER w AS p2, lag(value, 1)  OVER w AS p1,
               lead(value, 1) OVER w AS n1, lead(value, 2) OVER w AS n2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    hits AS (
        SELECT user_id, event_id
        FROM s
        WHERE p2 > p1 AND p1 > value AND value < n1 AND n1 < n2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_patterns,
           CAST(min(event_id) AS BIGINT) AS first_event_id
    FROM hits GROUP BY user_id
    """,
    "streaming complex-event detection (strict V-shape) via "
    "applyInPandasWithState with an O(pattern)-sized per-user tail; "
    "batch-twin SQL oracle (= ts_pattern_v_shape)",
    tags=("streaming", "stateful", "cep"),
)
def stream_pattern_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jobs.streaming_pattern_v_shape(spark, sf_dir)


@register(
    "stream_cdf_incremental_mart",
    # Exactly-once commits + exact change feeds compose: the consumer
    # only ever sees each landed row once, so the incrementally
    # maintained mart equals the batch rollup over raw events no
    # matter how the stream was sliced into micro-batches.
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round((sum(value)) * 100.0) / 100.0 + 0.0 AS total_value
    FROM events GROUP BY event_type
    """,
    "streaming landing zone + CDF consumer: each micro-batch is an "
    "idempotent manifest commit; a downstream mart is maintained from "
    "read_changes(last_seen, current) after every commit (file-level "
    "fast path: only the new files are ever scanned) and equals the "
    "batch rollup",
    tags=("streaming", "layout", "cdf", "incremental"),
)
def stream_cdf_incremental_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="stream_cdf_mart_")
    return jobs.streaming_cdf_incremental_mart(
        spark, sf_dir, work, rows_per_batch=2000
    )


@register(
    "stream_wap_quality_gate",
    # Every micro-batch passes stage -> audit -> publish; the audit
    # rule (no negative values) is PER-ROW so the published content is
    # slicing-independent; the injected poison batch fails its audit
    # and is discarded, so the final table is exactly the raw events
    # and wap_clean (empty staged registry at the end) is the literal
    # TRUE.
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round((sum(value)) * 100.0) / 100.0 + 0.0 AS total_value,
           TRUE AS wap_clean
    FROM events GROUP BY event_type
    """,
    "quality-gated streaming ingest (write-audit-publish per "
    "micro-batch): readers never see an unaudited batch, a failing "
    "batch discards without a trace, replays resume idempotently "
    "across the three WAP steps; rollup equals the batch aggregate",
    tags=("streaming", "layout", "wap"),
)
def stream_wap_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    work = tempfile.mkdtemp(prefix="stream_wap_")
    return jobs.streaming_wap_landing(spark, sf_dir, work, rows_per_batch=2000)
