"""The three feature-derivation pipelines (SURVEY.md §2 / §3.2), mapped
onto the driver fixtures per FIXTURES.md §1:

- ``customer``  ↔ users        (c_custkey ↔ user_id)
- ``orders``    ↔ transactions (o_totalprice amount, o_orderstatus
                                status, o_orderpriority payment method)
- ``lineitem``  ↔ payment/merchant detail (l_suppkey ↔ merchant,
                                l_shipdate ↔ payment date)
- ``events``    ↔ login / velocity-alert / risk-score feeds

Reference SQL being re-expressed: ``sql/user_features.sql``,
``sql/transaction_features.sql``, ``sql/risk_features.sql`` and their
inline twins at ``src/pipelines/batch_pipeline.py:127-203``.

Determinism: every window is anchored on an injected ``ref_date`` /
``now`` (never wall clock) — SURVEY.md §7.1.

Scale notes: each pipeline is one scan per fact table with all
conditional aggregates fused into a single ``groupBy(user)`` (the
reference's scan-once-aggregate-many, SURVEY.md §4), followed by left
joins on the same key. On a cluster the fact-side shuffles all hash on
``user_id`` so the final multi-join co-partitions; the dimension
(customer) side is small relative to facts and broadcast when under
the AQE threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_spark.functions.scalars import is_night, is_weekend, safe_ratio
from feature_store_spark.tables import (
    EVENTS_NOW,
    REF_DATE,
    prune_months,
    window_scan,
)

# Order-status analogues (documented mapping, not TPC-H semantics):
# 'F'/'O' = completed/fulfilled (reference `sql/user_features.sql:13`
# status IN ('completed','fulfilled')); 'P' = declined/failed.
COMPLETED_STATUSES = ("F", "O")
DECLINED_STATUS = "P"


def derive_user_features(
    customer: DataFrame,
    orders: DataFrame,
    ref_date: str = REF_DATE,
    orders_custkey: DataFrame | None = None,
    orders_stats: DataFrame | None = None,
) -> DataFrame:
    """users ⟕ per-user order stats (reference `sql/user_features.sql`).

    Exercises: left join for aggregation-over-join (J3), plain aggs
    (A1), mode (A4), COALESCE zero-fill (F1), CASE null-guard (F2),
    datediff (F4). Customers with no completed orders keep a row with
    zero-filled features (`sql/user_features.sql:33-39`).

    One orders scan: the aggregate runs at (custkey, priority)
    granularity first, then re-aggregates per custkey — the stats sums
    recompose exactly (integer cents, min dates), and the mode falls
    out as ``min_by(prio, struct(-cnt, prio))`` (same tie-break as
    ``mode_deterministic``: highest count, then smallest value). A
    separate mode pass would scan orders a second time; the priority
    key only widens a map-side-combined shuffle ~5×.

    ``orders_custkey``: the same rows served from the custkey-
    bucketed projection (pipelines/facts.py) — the per-user aggregate
    then needs NO exchange at all (the scan already hash-distributes
    on o_custkey). Defaults to ``orders``; results are layout-
    independent.

    ``orders_stats``: the mergeable per-(custkey, priority, status)
    aggregate projection (``orders_user_stats`` in pipelines/facts.py
    — round 11): count / integer-cents sum / min orderdate partials
    maintained at ingest. When provided it replaces the raw-orders
    scan entirely — the pipeline re-aggregates customer-bounded
    summary rows (≤ ~15 per customer) instead of the full order
    history; sums-of-sums and min-of-mins recompose the identical
    values (exact integer cents, dates), so results are again
    layout-independent. Takes precedence over ``orders_custkey``.
    """
    # Money aggregates use exact integer cents (bigint) so the result
    # is independent of float summation order — the derived avg is a
    # single double division of identical operands in any engine,
    # making differential hashes bit-stable (SURVEY.md §7.4 precision).
    if orders_stats is not None:
        per_prio = (
            orders_stats.filter(
                F.col("o_orderstatus").isin(*COMPLETED_STATUSES)
            )
            .groupBy("o_custkey", "o_orderpriority")
            .agg(
                F.sum("n_orders").alias("__cnt"),
                F.sum("sum_cents").alias("__cents"),
                F.min("first_orderdate").alias("__first"),
            )
        )
    else:
        occ = orders_custkey if orders_custkey is not None else orders
        completed = occ.filter(
            F.col("o_orderstatus").isin(*COMPLETED_STATUSES)
        )
        cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
        per_prio = completed.groupBy("o_custkey", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum(cents).alias("__cents"),
            F.min("o_orderdate").alias("__first"),
        )
    prio_ok = F.col("o_orderpriority").isNotNull()
    stats = per_prio.groupBy("o_custkey").agg(
        F.sum("__cnt").alias("__n_orders"),
        F.sum("__cents").alias("__sum_cents"),
        F.min("__first").alias("__first_order"),
        F.min_by(
            F.when(prio_ok, F.col("o_orderpriority")),
            F.when(
                prio_ok,
                F.struct(
                    (-F.col("__cnt")).alias("n"), F.col("o_orderpriority")
                ),
            ),
        ).alias("__preferred"),
    )
    ref = F.to_date(F.lit(ref_date))
    return (
        customer.join(stats, customer.c_custkey == stats.o_custkey, "left")
        .drop("o_custkey")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("account_balance"),
            F.coalesce(F.col("__n_orders"), F.lit(0))
            .cast("bigint")
            .alias("total_orders"),
            F.coalesce(
                F.col("__sum_cents") / 100.0 / F.col("__n_orders"), F.lit(0.0)
            ).alias("avg_order_value"),
            F.when(F.col("__first_order").isNull(), F.lit(None))
            .otherwise(F.datediff(ref, F.to_date("__first_order")))
            .cast("int")
            .alias("days_since_first_order"),
            F.col("__preferred").alias("preferred_payment_method"),
        )
    )


def derive_transaction_features(
    orders: DataFrame,
    lineitem: DataFrame,
    ref_date: str = REF_DATE,
    orders_custkey: DataFrame | None = None,
    lineitem_custkey: DataFrame | None = None,
) -> DataFrame:
    """Trailing-30d conditional aggregates over a 31d scan (reference
    `sql/transaction_features.sql`).

    Exercises: time-predicate scan (S1/P3), conditional aggs (A2),
    conditional distinct (A3), ratio-of-conditional-counts (A5),
    HAVING activity gate (A6), NULLIF guard (F3), weekend/night
    scalar semantics (F5/F6/P6).

    The 31d scan feeding all 30d aggregates preserves the reference's
    scan-once shape; the filter reaches the parquet scan so at 100 TB
    with date-partitioned data only ~1 month of partitions is read.
    """
    ref = F.to_date(F.lit(ref_date))
    # the 31d aggregate shuffles on o_custkey — the custkey-bucketed
    # projection (when provided) makes it exchange-free; the merch
    # join below keeps the orderkey layout
    occ = orders_custkey if orders_custkey is not None else orders
    scan = window_scan(occ, "o_orderdate", ref_date, 31)
    in_30d = F.to_date("o_orderdate") >= F.date_sub(ref, 30)
    n_30d = F.count(F.when(in_30d, 1))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    feats = scan.groupBy(F.col("o_custkey").alias("user_id")).agg(
        n_30d.cast("bigint").alias("total_transactions_30d"),
        F.sum(F.when(in_30d, cents)).alias("__sum_cents_30d"),
        F.max(F.when(in_30d, F.col("o_totalprice"))).alias(
            "max_transaction_amount"
        ),
        F.count(
            F.when(in_30d & (F.col("o_orderstatus") == DECLINED_STATUS), 1)
        )
        .cast("bigint")
        .alias("transactions_declined_30d"),
        safe_ratio(
            F.count(F.when(in_30d & is_weekend(F.col("o_orderdate")), 1)),
            n_30d,
        ).alias("weekend_transaction_ratio"),
        safe_ratio(
            F.count(F.when(in_30d & is_night(F.col("o_orderdate")), 1)),
            n_30d,
        ).alias("night_transaction_ratio"),
    ).withColumns(
        {
            "total_amount_30d": F.coalesce(F.col("__sum_cents_30d"), F.lit(0))
            / 100.0,
            "avg_transaction_amount": F.col("__sum_cents_30d")
            / 100.0
            / F.col("total_transactions_30d"),
        }
    ).drop("__sum_cents_30d").select(
        "user_id",
        "total_transactions_30d",
        "total_amount_30d",
        "avg_transaction_amount",
        "max_transaction_amount",
        "transactions_declined_30d",
        "weekend_transaction_ratio",
        "night_transaction_ratio",
    )
    # Activity gate: HAVING COUNT(*) FILTER (30d) > 0
    # (`src/pipelines/batch_pipeline.py:171`).
    feats = feats.filter(F.col("total_transactions_30d") > 0)

    # unique_merchants_30d: distinct suppliers shipped to the user in
    # the window (l_suppkey ↔ merchant_id, FIXTURES.md §1). With the
    # denormalized lineitem_by_custkey projection (facts.py — the
    # lineitem⋈orders join landed once at ingest, custkey-bucketed,
    # shipdate-sorted) this is a single page-skipped scan and an
    # exchange-free aggregate; measured sf≈4 the query-time join it
    # replaces was ~90% of this pipeline's wall time. The join
    # fallback runs when no projection is materialized: shuffle_hash
    # builds the window-filtered lineitem side (30d of shipments,
    # bounded) while the full orders projection streams through as
    # probe — no per-side sorts (sf≈1: 1.33 s → 0.81 s over
    # sort-merge; at 100 TB skips sorting the entire orders table).
    if lineitem_custkey is not None:
        merch = (
            window_scan(lineitem_custkey, "l_shipdate", ref_date, 30)
            .groupBy(F.col("o_custkey").alias("user_id"))
            .agg(F.countDistinct("l_suppkey").alias("unique_merchants_30d"))
        )
    else:
        merch = (
            window_scan(lineitem, "l_shipdate", ref_date, 30)
            .hint("shuffle_hash")
            .join(
                orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy(F.col("o_custkey").alias("user_id"))
            .agg(F.countDistinct("l_suppkey").alias("unique_merchants_30d"))
        )
    return feats.join(merch, "user_id", "left").withColumn(
        "unique_merchants_30d",
        F.coalesce(F.col("unique_merchants_30d"), F.lit(0)).cast("bigint"),
    )


def derive_risk_features(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
    ref_date: str = REF_DATE,
    now: str = EVENTS_NOW,
    orders_custkey: DataFrame | None = None,
    lineitem_custkey: DataFrame | None = None,
) -> DataFrame:
    """Union-of-active-keys + multi-way left join of per-feed
    aggregates (reference `sql/risk_features.sql:1-109`).

    Feed analogues (FIXTURES.md §1): payment delays = lineitems shipped
    >60 days after order date; failed payments = 'P'-status orders;
    device/location diversity = distinct event types / distinct props
    per user; velocity alerts = 'error' events; latest risk score =
    newest 'purchase' event value per user (latest-per-key, W1).

    Exercises: U1 3-way union-distinct of key sets, J2 5-way left
    join, A2/A3 conditional counts, W1 latest-per-key, F1 COALESCE.

    Plan shape: ONE scan per feed — orders aggregates failed payments
    and the 90d-activity flag together; events aggregates behavior,
    30d-activity, and the latest purchase score (``max_by(value,
    struct(ts, event_id))`` — the W1 latest-per-key as a single
    aggregate, same (ts desc, event_id desc) tie-break as the window
    form). The active-key union then falls out of a 3-way full outer
    join of the already-aggregated feeds filtered on the activity
    flags, instead of a separate union-distinct pass that would rescan
    orders and events. A narrow second orders scan remains as the
    lineitem join side.
    """
    ref = F.to_date(F.lit(ref_date))
    now_ts = F.to_timestamp(F.lit(now))

    # Payment-delay feed: one scan of lineitem⋈orders, both windows as
    # conditional aggs (delays_30d ⊆ delays_90d by construction). Every
    # user with 90d payment activity gets a row (possibly zero delays)
    # — membership itself feeds the active-key set.
    # With the denormalized lineitem_by_custkey projection the feed is
    # a single page-skipped scan and an exchange-free aggregate (see
    # derive_transaction_features). Fallback: shuffle_hash on the
    # 90d-filtered lineitem build side — sort-merge pays two sorts of
    # the full orders projection for nothing.
    if lineitem_custkey is not None:
        pay_src = window_scan(lineitem_custkey, "l_shipdate", ref_date, 90)
    else:
        pay_src = (
            window_scan(lineitem, "l_shipdate", ref_date, 90)
            .hint("shuffle_hash")
            .join(
                orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
    pay = (
        pay_src
        .withColumn(
            "__delayed", F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
        )
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count(
                F.when(
                    F.col("__delayed")
                    & (F.to_date("l_shipdate") >= F.date_sub(ref, 30)),
                    1,
                )
            )
            .cast("bigint")
            .alias("payment_delays_30d"),
            F.count(F.when(F.col("__delayed"), 1))
            .cast("bigint")
            .alias("payment_delays_90d"),
        )
    )

    # Failed payments over a 2y lookback (`sql/risk_features.sql:25`)
    # + the 90d-activity flag, one orders scan for both.
    declined = F.col("o_orderstatus") == DECLINED_STATUS
    od = F.to_date("o_orderdate")
    # coarse-only prune: the filter is a DISJUNCTION of windows whose
    # union is bounded by the 24-month lookback (732 d covers a leap
    # span) — the fine predicate below is unchanged
    # custkey-bucketed projection (when provided): this per-user
    # aggregate is the pipeline's one fact-row shuffle — the custkey
    # scan makes it exchange-free. The lineitem join above stays on
    # the orderkey layout.
    occ = orders_custkey if orders_custkey is not None else orders
    ostats = (
        prune_months(occ, "o_orderdate", ref_date, 732)
        .filter(declined & (od >= F.add_months(ref, -24)) | (od >= F.date_sub(ref, 90)))
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count(F.when(declined & (od >= F.add_months(ref, -24)), 1))
            .cast("bigint")
            .alias("__failed"),
            F.max(F.when(od >= F.date_sub(ref, 90), F.lit(1))).alias(
                "__active90"
            ),
        )
    )

    # Behavior feed over events: device/location diversity + velocity
    # alerts in the trailing 30d of the injected `now`, the 30d activity
    # flag, AND the latest purchase score — ONE events scan, one
    # groupBy. Distinct counts run as ``size(collect_set(...))`` rather
    # than two ``countDistinct``s: multiple distinct aggregates plan an
    # Expand (3× the event rows through the shuffle) and demote the
    # whole aggregate — including the ``max_by`` ordering buffer — to
    # SortAggregate; collect_set keeps everything in one
    # ObjectHashAggregate with map-side partials (measured 0.56 s →
    # 0.23 s at sf0.1, identical results). Per-user 30d device/location
    # cardinality is bounded (dozens), so the set buffers stay small at
    # any corpus scale; for an UNBOUNDED-cardinality distinct this
    # trade reverses and Expand+countDistinct (or
    # approx_count_distinct) is the spill-safe choice.
    ein30 = F.col("ts") >= now_ts - F.expr("INTERVAL 30 DAYS")
    purchase = F.col("event_type") == "purchase"
    ev = events.groupBy(F.col("user_id")).agg(
        F.size(F.collect_set(F.when(ein30, F.col("event_type"))))
        .cast("bigint")
        .alias("__dev30"),
        F.size(F.collect_set(F.when(ein30, F.col("props"))))
        .cast("bigint")
        .alias("__loc30"),
        F.count(F.when(ein30 & (F.col("event_type") == "error"), 1))
        .cast("bigint")
        .alias("__vel30"),
        F.max(F.when(ein30, F.lit(1))).alias("__ev30"),
        # latest-per-key (W1) as a single aggregate; the when() guards
        # make non-purchase rows invisible to the ordering struct, so
        # the result matches a purchase-filtered max_by exactly.
        F.max_by(
            F.when(purchase, F.col("value")),
            F.when(purchase, F.struct(F.col("ts"), F.col("event_id"))),
        ).alias("__risk"),
    )

    # Active keys (`sql/risk_features.sql:73-90`): 90d orders ∪ 90d
    # payment activity ∪ 30d events — a filter over the full outer
    # join of the three per-user feeds.
    active = (
        (F.coalesce(F.col("__active90"), F.lit(0)) == 1)
        | F.col("payment_delays_90d").isNotNull()
        | (F.coalesce(F.col("__ev30"), F.lit(0)) == 1)
    )
    return (
        ostats.join(pay, "user_id", "full_outer")
        .join(ev, "user_id", "full_outer")
        .filter(active)
        .select(
            "user_id",
            F.coalesce("payment_delays_30d", F.lit(0)).alias("payment_delays_30d"),
            F.coalesce("payment_delays_90d", F.lit(0)).alias("payment_delays_90d"),
            F.coalesce("__failed", F.lit(0)).alias("failed_payments_count"),
            F.coalesce("__dev30", F.lit(0)).alias("device_changes_30d"),
            F.coalesce("__loc30", F.lit(0)).alias("login_locations_30d"),
            F.coalesce("__vel30", F.lit(0)).alias("velocity_alerts_30d"),
            F.col("__risk").alias("risk_score"),
        )
    )


def serving_join(
    user_features: DataFrame,
    transaction_features: DataFrame,
    risk_features: DataFrame,
) -> DataFrame:
    """uf ⟕ tf ⟕ rf on user_id — the reference's serving/analytics join
    (`sql/migration_queries.sql:143-166`, J6). All three inputs are
    keyed aggregates on user_id, so on a cluster the joins co-partition
    on the already-shuffled key.

    Use this composition when the three feature tables are already
    materialized (the daily-pipeline case). To compute the full serving
    table from raw inputs in one query, use :func:`serving_features`,
    which fuses the three derivations into one scan per fact table."""
    return user_features.join(transaction_features, "user_id", "left").join(
        risk_features, "user_id", "left"
    )


def serving_features(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
    ref_date: str = REF_DATE,
    now: str = EVENTS_NOW,
    orders_custkey: DataFrame | None = None,
    lineitem_custkey: DataFrame | None = None,
) -> DataFrame:
    """The serving join computed from raw tables with ONE aggregation
    pass per fact table — result identical to
    ``serving_join(derive_user_features(...),
    derive_transaction_features(...), derive_risk_features(...))``.

    Composing the three pipelines re-reads every fact table per
    pipeline (Spark reuses no subtrees): orders 7×, lineitem 2×,
    events 3× — 15 scans, 22 exchanges. This is the reference's
    scan-once-aggregate-many (SURVEY.md §4) applied ACROSS pipelines:

    - **orders**: one groupBy(custkey, priority) computing uf stats
      (completed-conditional), every tf 30d conditional agg, rf failed
      payments, and the 90d-activity flag as partial aggregates, then a
      per-custkey re-aggregate whose ``min_by(prio, struct(-cnt,
      prio))`` recovers the deterministic mode — the priority key adds
      ~5× rows to a map-side-combined shuffle, far cheaper than a
      second scan for the mode. One narrow second scan remains for the
      lineitem join's (orderkey, custkey, orderdate) sides.
    - **lineitem ⋈ orders** once over the 90d ship window, computing
      tf's distinct-merchants (30d-conditional) and rf's delay counts
      together.
    - **events**: one groupBy(user) with 30d-conditional behavior aggs
      plus ``max_by(value, struct(ts, event_id))`` over purchase events
      — the latest-per-key W1 as a single aggregate instead of a
      row_number window pass.

    The uf⟕tf⟕rf left-join semantics (tf rows exist only where the
    activity HAVING passed; rf rows only for active users) become CASE
    gates on the joined row, so customers outside those sets get the
    same NULLs the three-way join would produce. At 100 TB this shape
    reads each fact table once instead of 2-3×, and every aggregate
    shuffles map-combined partials on the same user key the final join
    needs."""
    ref = F.to_date(F.lit(ref_date))
    now_ts = F.to_timestamp(F.lit(now))
    od = F.to_date("o_orderdate")
    completed = F.col("o_orderstatus").isin(*COMPLETED_STATUSES)
    declined = F.col("o_orderstatus") == DECLINED_STATUS
    in30 = od >= F.date_sub(ref, 30)
    in90 = od >= F.date_sub(ref, 90)
    in24m = od >= F.add_months(ref, -24)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    prio_ok = F.col("__prio").isNotNull() & (F.col("__c_cnt") > 0)

    # custkey-bucketed projection (when provided): HashPartitioning
    # on o_custkey satisfies the clustered distribution of BOTH
    # groupBys below (custkey ⊂ (custkey, prio)), so the whole
    # two-level orders aggregate runs exchange-free.
    l1 = (orders_custkey if orders_custkey is not None else orders).groupBy(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderpriority").alias("__prio"),
    ).agg(
        F.count(F.when(completed, 1)).alias("__c_cnt"),
        F.sum(F.when(completed, cents)).alias("__c_cents"),
        F.min(F.when(completed, F.col("o_orderdate"))).alias("__c_first"),
        F.count(F.when(in30, 1)).alias("__n30"),
        F.sum(F.when(in30, cents)).alias("__s30"),
        F.max(F.when(in30, F.col("o_totalprice"))).alias("__max30"),
        F.count(F.when(in30 & declined, 1)).alias("__dec30"),
        F.count(F.when(in30 & is_weekend(F.col("o_orderdate")), 1)).alias(
            "__wk30"
        ),
        F.count(F.when(in30 & is_night(F.col("o_orderdate")), 1)).alias(
            "__nt30"
        ),
        F.count(F.when(in90, 1)).alias("__n90"),
        F.count(F.when(declined & in24m, 1)).alias("__fail24"),
    )
    ostats = l1.groupBy("user_id").agg(
        F.sum("__c_cnt").alias("__n_orders"),
        F.sum("__c_cents").alias("__sum_cents"),
        F.min("__c_first").alias("__first_order"),
        F.min_by(
            F.when(prio_ok, F.col("__prio")),
            F.when(
                prio_ok,
                F.struct((-F.col("__c_cnt")).alias("n"), F.col("__prio")),
            ),
        ).alias("__preferred"),
        F.sum("__n30").alias("__t30"),
        F.sum("__s30").alias("__sc30"),
        F.max("__max30").alias("__tmax30"),
        F.sum("__dec30").alias("__tdec30"),
        F.sum("__wk30").alias("__twk30"),
        F.sum("__nt30").alias("__tnt30"),
        F.max(F.when(F.col("__n90") > 0, F.lit(1))).alias("__active90"),
        F.sum("__fail24").alias("__tfail24"),
    )

    ship = F.to_date("l_shipdate")
    delayed = ship > F.date_add(F.to_date("o_orderdate"), 60)
    # denormalized custkey projection (when provided): single
    # page-skipped scan, exchange-free aggregate — else the
    # shuffle_hash build on the window-filtered side (see
    # derive_transaction_features for the measurement)
    if lineitem_custkey is not None:
        li_src = window_scan(lineitem_custkey, "l_shipdate", ref_date, 90)
    else:
        li_src = (
            window_scan(lineitem, "l_shipdate", ref_date, 90)
            .hint("shuffle_hash")
            .join(
                orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
    li = (
        li_src
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.countDistinct(
                F.when(ship >= F.date_sub(ref, 30), F.col("l_suppkey"))
            ).alias("__merch30"),
            F.count(
                F.when(delayed & (ship >= F.date_sub(ref, 30)), 1)
            ).alias("__delay30"),
            F.count(F.when(delayed, 1)).alias("__delay90"),
        )
    )

    # Same single-scan events aggregate as derive_risk_features:
    # collect_set distincts + fused max_by in one ObjectHashAggregate
    # (see the scale/cardinality note there).
    ein30 = F.col("ts") >= now_ts - F.expr("INTERVAL 30 DAYS")
    purchase = F.col("event_type") == "purchase"
    ev = events.groupBy("user_id").agg(
        F.size(F.collect_set(F.when(ein30, F.col("event_type")))).alias(
            "__dev30"
        ),
        F.size(F.collect_set(F.when(ein30, F.col("props")))).alias("__loc30"),
        F.count(F.when(ein30 & (F.col("event_type") == "error"), 1)).alias(
            "__vel30"
        ),
        F.max(F.when(ein30, F.lit(1))).alias("__ev30"),
        F.max_by(
            F.when(purchase, F.col("value")),
            F.when(purchase, F.struct(F.col("ts"), F.col("event_id"))),
        ).alias("__risk"),
    )

    joined = (
        customer.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("account_balance"),
        )
        .join(ostats, "user_id", "left")
        .join(li, "user_id", "left")
        .join(ev, "user_id", "left")
    )
    # tf rows exist only where the 30d activity HAVING passed; rf rows
    # only for the active-key union (90d orders ∪ 90d payment activity
    # ∪ 30d events). Outside those sets every column is NULL, exactly
    # as the three-way left join produces.
    has_tf = F.coalesce(F.col("__t30"), F.lit(0)) > 0
    active = (
        (F.coalesce(F.col("__active90"), F.lit(0)) == 1)
        | F.col("__delay90").isNotNull()
        | (F.coalesce(F.col("__ev30"), F.lit(0)) == 1)
    )
    return joined.select(
        "user_id",
        "name",
        "segment",
        "account_balance",
        F.coalesce(F.col("__n_orders"), F.lit(0))
        .cast("bigint")
        .alias("total_orders"),
        F.coalesce(
            F.col("__sum_cents") / 100.0 / F.col("__n_orders"), F.lit(0.0)
        ).alias("avg_order_value"),
        F.when(F.col("__first_order").isNull(), F.lit(None))
        .otherwise(F.datediff(ref, F.to_date("__first_order")))
        .cast("int")
        .alias("days_since_first_order"),
        F.col("__preferred").alias("preferred_payment_method"),
        F.when(has_tf, F.col("__t30"))
        .cast("bigint")
        .alias("total_transactions_30d"),
        F.when(has_tf, F.coalesce(F.col("__sc30"), F.lit(0)) / 100.0).alias(
            "total_amount_30d"
        ),
        F.when(has_tf, F.col("__sc30") / 100.0 / F.col("__t30")).alias(
            "avg_transaction_amount"
        ),
        F.when(has_tf, F.col("__tmax30")).alias("max_transaction_amount"),
        F.when(has_tf, F.col("__tdec30"))
        .cast("bigint")
        .alias("transactions_declined_30d"),
        F.when(has_tf, safe_ratio(F.col("__twk30"), F.col("__t30"))).alias(
            "weekend_transaction_ratio"
        ),
        F.when(has_tf, safe_ratio(F.col("__tnt30"), F.col("__t30"))).alias(
            "night_transaction_ratio"
        ),
        F.when(has_tf, F.coalesce(F.col("__merch30"), F.lit(0)))
        .cast("bigint")
        .alias("unique_merchants_30d"),
        F.when(active, F.coalesce(F.col("__delay30"), F.lit(0)))
        .cast("bigint")
        .alias("payment_delays_30d"),
        F.when(active, F.coalesce(F.col("__delay90"), F.lit(0)))
        .cast("bigint")
        .alias("payment_delays_90d"),
        F.when(active, F.coalesce(F.col("__tfail24"), F.lit(0)))
        .cast("bigint")
        .alias("failed_payments_count"),
        F.when(active, F.coalesce(F.col("__dev30"), F.lit(0)))
        .cast("bigint")
        .alias("device_changes_30d"),
        F.when(active, F.coalesce(F.col("__loc30"), F.lit(0)))
        .cast("bigint")
        .alias("login_locations_30d"),
        F.when(active, F.coalesce(F.col("__vel30"), F.lit(0)))
        .cast("bigint")
        .alias("velocity_alerts_30d"),
        F.when(active, F.col("__risk")).alias("risk_score"),
    )
