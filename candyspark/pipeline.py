"""The candy-store ETL pipeline, end-to-end (reference parity, SURVEY.md M3).

Re-expresses the reference pipeline (/root/reference/src/main.py:112-180 +
src/data_processor.py:295-572) as pure DataFrame stages with the reference's
anti-patterns removed (SURVEY.md §4.2):

- ONE pass over all days (day ordering folded into the allocator's sort key)
  instead of a 10-iteration driver loop with 10× input rescans (:353-436);
- inventory state travels in-data via a broadcast dim join + applyInPandas
  instead of a per-day driver ``collect()`` dict (:401-406) and RDD
  ``groupByKey`` (:410-429);
- the stock decrement is one aggregate + one join, not 10 chained full-outer
  joins on a growing lineage (:444-464);
- money stays numeric until the sink; golden CSV formatting (%.2f) happens
  only in ``save_outputs`` (:485-487,511-513,565-570 format in-DataFrame);
- allocation order is the documented TOTAL order (order_datetime, order_id)
  — the reference leaves it underdetermined at stock-exhaustion and its own
  outputs diverge from its goldens (SURVEY.md §2.9 [verified]).

At 100-TB scale: transactions shuffle once on product_id for the allocator
(per-product groups are independent → 1000-executor parallelism), dimension
joins broadcast, and the per-order/per-day aggregations are partial+final
hash aggs. The only sequential computation is within one product's history.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from candyspark.operators.allocation import allocate_greedy
from candyspark.schemas import CUSTOMERS, PRODUCTS, TRANSACTIONS_RAW
from candyspark.sources.readers import load_csv, load_json_array_files
from candyspark.sources.sinks import save_single_csv


@dataclass
class CandyOutputs:
    """The five reference outputs (numeric; formatting happens at the sink)."""

    orders: DataFrame
    order_line_items: DataFrame
    products_updated: DataFrame
    daily_summary: DataFrame


def load_inputs(
    spark: SparkSession, data_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S1/S2 scans with explicit schemas (vs. inferSchema, reference
    :104-114). Returns (customers, products, transactions_raw)."""
    customers = load_csv(spark, f"{data_dir}/customers.csv", CUSTOMERS)
    products = load_csv(spark, f"{data_dir}/products.csv", PRODUCTS)
    transactions = load_json_array_files(
        spark, f"{data_dir}/transactions_*.json", TRANSACTIONS_RAW
    )
    return customers, products, transactions


def prepare_line_items(transactions: DataFrame) -> DataFrame:
    """Explode + project + null-filter (reference _prepare_transactions_df +
    per-day explode, :316-345,366-385): one row per requested item with the
    order header attached. ``order_datetime`` keeps the RAW ISO string (the
    output contract) alongside a parsed timestamp for ordering. The
    reference's full-row ``dropDuplicates()`` (:398) is reproduced on the
    line-item grain."""
    return (
        transactions.na.drop()  # P5, reference :343
        .select(
            F.col("transaction_id").alias("order_id"),
            F.col("timestamp").alias("order_datetime"),
            F.to_timestamp("timestamp").alias("order_ts"),
            F.col("customer_id"),
            F.explode("items").alias("item"),  # F1, reference :326,:366
        )
        .select(
            "order_id",
            "order_datetime",
            "order_ts",
            "customer_id",
            F.col("item.product_id").alias("product_id"),
            F.col("item.qty").cast("int").alias("quantity"),
        )
        .filter(F.col("quantity").isNotNull())  # P2, reference :333,377-379
        .dropDuplicates()  # P9, reference :398
    )


def allocate_inventory(line_items: DataFrame, products: DataFrame) -> DataFrame:
    """§2.9 allocator over the WHOLE period in one applyInPandas pass,
    stock + unit price attached via broadcast join (J1, reference :388-390).
    Total order: (order_ts, order_id) — chronological, ties broken by
    order_id; equivalent to the reference's day-loop + within-day
    chronological scan wherever timestamps are unique."""
    dim = products.select(
        "product_id",
        F.col("stock").cast("double").alias("stock"),
        F.col("sales_price").alias("unit_price"),
    )
    enriched = line_items.join(F.broadcast(dim), "product_id", "left")
    return allocate_greedy(
        enriched,
        group_col="product_id",
        order_cols=["order_ts", "order_id"],
        qty_col="quantity",
        stock_col="stock",
        unit_price_col="unit_price",
        out_keys=["order_id", "product_id", "unit_price"],
    )


def build_final_outputs(
    allocated: DataFrame, line_items: DataFrame, products: DataFrame
) -> CandyOutputs:
    """Final orders / order_line_items / products_updated / daily_summary
    (reference _build_final_data :466-515, save_updated_inventory :574-582,
    create_daily_summary :517-572), all numeric."""
    order_line_items = allocated.select(
        "order_id",
        "product_id",
        F.col("fulfilled_qty").cast("int").alias("quantity"),
        "unit_price",
        F.round(F.col("line_total"), 2).alias("line_total"),
    )

    # A2: per-order totals; num_items counts lines INCLUDING cancelled ones
    # (reference counts rows, :490-493 — a deliberate parity quirk).
    order_summary = order_line_items.groupBy("order_id").agg(
        F.round(F.sum("line_total"), 2).alias("total_amount"),
        F.count("product_id").alias("num_items"),
    )

    headers = line_items.select(
        "order_id", "order_datetime", "order_ts", "customer_id"
    ).distinct()
    orders = (
        headers.join(order_summary, "order_id", "left")
        # na.drop (reference :508): orders whose items were all null-qty have
        # no line items → null total_amount → dropped (10,000 → 9,846).
        .na.drop()
        .select(
            "order_id", "order_datetime", "order_ts", "customer_id",
            "total_amount", "num_items",
        )
    )

    # J2 as ONE agg + ONE join (not 10 chained outer joins, §4.2).
    sold = allocated.groupBy("product_id").agg(
        F.sum("fulfilled_qty").alias("sold_qty")
    )
    products_updated = (
        products.join(sold, "product_id", "left")
        .select(
            "product_id",
            "product_name",
            (F.col("stock") - F.coalesce("sold_qty", F.lit(0.0)))
            .cast("int")
            .alias("current_stock"),
        )
    )

    # Daily summary (J4/J5/J6 + A3/A4, reference :517-572): per-line profit
    # against cost_to_make, day bucketing from the order timestamp.
    cost_dim = products.select("product_id", "cost_to_make")
    with_profit = order_line_items.join(F.broadcast(cost_dim), "product_id", "left").withColumn(
        "line_profit",
        F.round(F.col("line_total") - F.col("quantity") * F.col("cost_to_make"), 2),
    )
    order_dates = orders.select(
        "order_id", F.to_date("order_ts").alias("date")
    ).distinct()
    daily_orders = order_dates.groupBy("date").agg(
        F.countDistinct("order_id").alias("num_orders")
    )
    daily_money = (
        with_profit.join(order_dates, "order_id", "left")
        .groupBy("date")
        .agg(
            F.round(F.sum("line_total"), 2).alias("total_sales"),
            F.round(F.sum("line_profit"), 2).alias("total_profit"),
        )
    )
    daily_summary = daily_orders.join(daily_money, "date", "inner").orderBy("date")

    return CandyOutputs(
        orders=orders,
        order_line_items=order_line_items,
        products_updated=products_updated,
        daily_summary=daily_summary,
    )


def run_pipeline(spark: SparkSession, data_dir: str) -> CandyOutputs:
    """The whole batch pipeline: load → prepare → allocate → finalize."""
    _customers, products, transactions = load_inputs(spark, data_dir)
    line_items = prepare_line_items(transactions)
    allocated = allocate_inventory(line_items, products)
    return build_final_outputs(allocated, line_items, products)


def run_pipeline_observed(
    spark: SparkSession, data_dir: str
) -> tuple[CandyOutputs, dict]:
    """``run_pipeline`` with flow metrics attached via ``df.observe()`` —
    the engine's answer to the reference's count()-as-control-flow
    anti-pattern (A5, SURVEY.md §2.5/§4.2: 17+ extra jobs, each a full
    re-scan). Observations are accumulator-backed: they ride the SAME job
    that materializes the outputs, costing zero extra scans at any SF.

    Returns the outputs plus {stage: Observation}; call ``.get`` on an
    Observation AFTER an action has run the corresponding frame (it
    blocks until the metrics exist)."""
    from pyspark.sql import Observation

    obs = {
        "line_items": Observation("line_items"),
        "orders": Observation("orders"),
    }
    _customers, products, transactions = load_inputs(spark, data_dir)
    line_items = prepare_line_items(transactions).observe(
        obs["line_items"],
        F.count(F.lit(1)).alias("n_line_items"),
        # DISTINCT aggregates are disallowed in observed metrics (they need
        # a second shuffle pass; observations are single-pass accumulators)
        # — the sketch form is the observe-compatible counterpart
        F.approx_count_distinct("order_id", rsd=0.005).alias("n_orders_with_items"),
    )
    allocated = allocate_inventory(line_items, products)
    outputs = build_final_outputs(allocated, line_items, products)
    outputs = CandyOutputs(
        orders=outputs.orders.observe(
            obs["orders"],
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("total_amount").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_sales"),
        ),
        order_line_items=outputs.order_line_items,
        products_updated=outputs.products_updated,
        daily_summary=outputs.daily_summary,
    )
    return outputs, obs


def save_outputs(outputs: CandyOutputs, out_dir: str) -> None:
    """Golden-file CSV sinks (S7): sort + %.2f money formatting happen HERE,
    at the edge (vs. in-DataFrame format_number, reference :485-487 — whose
    thousands separators are a latent bug the goldens avoid only because all
    values < 1,000)."""
    money = lambda c: F.format_string("%.2f", F.col(c).cast("double")).alias(c)  # noqa: E731

    # sort via the sink's sort_cols (single-partition sort) — a global
    # orderBy here would add a RangePartitioner sampling pass per output:
    # one full extra execution of the pipeline subtree each, and double-
    # fired observe() metrics on the observed variant
    save_single_csv(
        outputs.order_line_items.select(
            "order_id", "product_id", "quantity", money("unit_price"), money("line_total")
        ),
        out_dir,
        "order_line_items.csv",
        sort_cols=["order_id", "product_id"],
    )
    save_single_csv(
        outputs.orders.select(
            "order_id", "order_datetime", "customer_id", money("total_amount"), "num_items"
        ),
        out_dir,
        "orders.csv",
        sort_cols=["order_id"],
    )
    save_single_csv(
        outputs.products_updated,
        out_dir,
        "products_updated.csv",
        sort_cols=["product_id"],
    )
    save_single_csv(
        outputs.daily_summary.select(
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            "num_orders",
            money("total_sales"),
            money("total_profit"),
        ),
        out_dir,
        "daily_summary.csv",
        sort_cols=["date"],
    )
