"""TPC-H roundtrip suite: the canonical relational workload, adapted to
the driver schema subset, through produce → plan → consume.

The driver's tables are TPC-H-shaped but omit partsupp and several
columns (o_shippriority, l_commitdate/l_receiptdate/l_shipmode,
c_phone/address/comment, p_mfgr/container). Each query below keeps its
canonical PLAN SHAPE (the join/agg/subquery structure the benchmark
exists to exercise) and swaps only unavailable columns for available
ones; adaptations are noted per query. Aggregate doubles are rounded
in-query (the fuzz suite's convention — the property under test is plan
fidelity, not IEEE summation order).

Q2/Q11 are partsupp-centric; the driver testdata lacks the table, so a
module fixture synthesizes it as a deterministic FK-consistent temp view
derived from part x supplier (see `partsupp` below) — all 22 queries
roundtrip.
"""

from __future__ import annotations

import pytest

from datafusion_substrait_spark import roundtrip
from tests.conftest import assert_same_result


def check(spark, sql: str) -> None:
    df = spark.sql(sql)
    assert_same_result(df, roundtrip(df))
    assert df.count() > 0, "vacuous adaptation"


def test_q01_pricing_summary(spark):
    check(spark, """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= date_sub(DATE '1998-12-01', 90)
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """)


def test_q03_shipping_priority(spark):
    # o_shippriority column absent: dropped from the select/group
    check(spark, """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1995-03-15'
          AND l_shipdate > DATE '1995-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """)


def test_q04_order_priority(spark):
    # commit/receipt dates absent: the EXISTS correlation tests
    # l_shipdate > o_orderdate instead (same semi-join shape)
    check(spark, """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)


def test_q05_local_supplier_volume(spark):
    check(spark, """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1999-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """)


def test_q06_forecasting_revenue(spark):
    check(spark, """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """)


def test_q07_volume_shipping(spark):
    check(spark, """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     year(l_shipdate) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              -- the synthetic corpus has no NATION_1<->NATION_2 flow;
              -- any ordered cross-nation pair keeps the dual-nation shape
              WHERE n1.n_name < n2.n_name
                AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1999-12-31'
             ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """)


def test_q08_market_share(spark):
    check(spark, """
        SELECT o_year,
               round(sum(CASE WHEN nationkey = 7 THEN volume ELSE 0 END)
                     / sum(volume), 6) AS mkt_share
        FROM (SELECT year(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     s_nationkey AS nationkey
              FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              WHERE r_name = 'AMERICA' AND p_size < 30
             ) all_nations
        GROUP BY o_year ORDER BY o_year
    """)


def test_q09_product_type_profit(spark):
    # partsupp (ps_supplycost) absent: profit reduces to discounted
    # revenue — the plan shape (5-way join + substring filter + two-key
    # aggregate) is intact
    check(spark, """
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS amount
              FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%widget%'
             ) profit
        GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """)


def test_q10_returned_items(spark):
    # phone/address/comment columns absent: dropped from the output
    check(spark, """
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """)


def test_q12_shipping_modes(spark):
    # l_shipmode/commit/receipt absent: buckets by shipdate lag instead;
    # keeps the two CASE-sum measures over a join
    check(spark, """
        SELECT CASE WHEN datediff(l_shipdate, o_orderdate) > 60
                    THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
               sum(CASE WHEN o_orderpriority = '1-URGENT'
                         OR o_orderpriority = '2-HIGH'
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority <> '1-URGENT'
                        AND o_orderpriority <> '2-HIGH'
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
        GROUP BY 1 ORDER BY 1
    """)


def test_q13_customer_distribution(spark):
    # o_comment NOT LIKE absent: the anti-ish filter uses priority; the
    # left-join + count + distribution-of-counts double aggregate is the
    # shape under test
    check(spark, """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '5-LOW'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """)


def test_q14_promotion_effect(spark):
    check(spark, """
        SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'STANDARD%'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4)
                   AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= DATE '1996-09-01'
          AND l_shipdate < DATE '1996-10-01'
    """)


def test_q15_top_supplier(spark):
    check(spark, """
        WITH revenue0 AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
        ORDER BY s_suppkey
    """)


def test_q16_parts_supplier(spark):
    # partsupp absent: lineitem is the part↔supplier bridge; keeps the
    # NOT IN subquery + count(DISTINCT) shape
    check(spark, """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 40
    """)


def test_q17_small_quantity_revenue(spark):
    # p_container absent: brand-only filter; the correlated scalar avg
    # subquery is the shape under test
    check(spark, """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#2'
          AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                            WHERE l_partkey = p_partkey)
    """)


def test_q18_large_volume_customer(spark):
    check(spark, """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING sum(l_quantity) > 90)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100
    """)


def test_q19_discounted_revenue(spark):
    # p_container/l_shipmode absent: size/quantity bands carry the
    # OR-of-conjunctions join predicate the query exists to test
    check(spark, """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 30)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 40)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 50)
    """)


def test_q20_potential_promotion(spark):
    # partsupp absent: the nested IN-subquery chain runs part →
    # lineitem → supplier instead (same doubly-nested semi-join shape)
    check(spark, """
        SELECT s_name, s_acctbal FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '%bolt%')
              AND l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 50)
        ORDER BY s_name
    """)


def test_q21_suppliers_kept_waiting(spark):
    # receipt/commit dates absent: "late" = shipped >90 days after the
    # order; keeps the EXISTS + NOT EXISTS double correlation over other
    # lineitems of the same order
    check(spark, """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND datediff(l1.l_shipdate, o_orderdate) > 90
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND datediff(l3.l_shipdate, o_orderdate) > 90)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """)


def test_q22_global_sales_opportunity(spark):
    # c_phone absent: the country-code substring runs over c_name; the
    # scalar-avg subquery + NOT EXISTS anti-join shape is intact
    check(spark, """
        SELECT cntrycode, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM (SELECT substring(c_name, 18, 1) AS cntrycode, c_acctbal,
                     c_custkey
              FROM customer
              WHERE substring(c_name, 18, 1) IN ('1','2','3','4','5','6','7')
                AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                                 WHERE c_acctbal > 0.00)) custsale
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = custsale.c_custkey
                            AND o_totalprice > 400000)
        GROUP BY cntrycode ORDER BY cntrycode
    """)


@pytest.fixture(scope="module")
def partsupp(spark):
    """Synthesized partsupp (r10): the driver testdata omits the table, so
    Q2/Q11 derive one from the REAL part x supplier tables — each part gets
    the deterministic ~2/5 slice of suppliers where (p_partkey + s_suppkey)
    % 5 < 2, with availqty/supplycost as arithmetic of the two keys.
    FK-consistent at every SF by construction, and because Catalyst inlines
    the temp view pre-optimization, the produced plan contains only
    registered NamedTable scans (no virtual-table blob grows with SF)."""
    spark.sql("""
        CREATE OR REPLACE TEMP VIEW partsupp AS
        SELECT p_partkey AS ps_partkey,
               s_suppkey AS ps_suppkey,
               CAST((p_partkey * 31 + s_suppkey * 17) % 9999 + 1 AS INT)
                   AS ps_availqty,
               round(((p_partkey * 13 + s_suppkey * 101) % 89900) / 100.0
                     + 1.0, 2) AS ps_supplycost
        FROM part JOIN supplier ON (p_partkey + s_suppkey) % 5 < 2
    """)
    yield
    spark.catalog.dropTempView("partsupp")


def test_q02_minimum_cost_supplier(spark, partsupp):
    # canonical correlated min-cost scalar subquery over partsupp; p_mfgr /
    # s_address/phone/comment absent -> p_brand / s_acctbal columns only;
    # p_type LIKE '%BRASS' -> = 'PROMO' (single-word synthetic pool)
    check(spark, """
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        FROM part
        JOIN partsupp ON p_partkey = ps_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size <= 25 AND p_type = 'PROMO' AND r_name = 'EUROPE'
          AND ps_supplycost = (
              SELECT min(ps_supplycost)
              FROM partsupp
              JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE p_partkey = ps_partkey AND r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """)


def test_q11_important_stock(spark, partsupp):
    # canonical GROUP BY + HAVING > (uncorrelated scalar subquery * frac);
    # single-nation filter -> region filter (synthetic nations don't repeat
    # across SFs); the fraction is half the average share so the result is
    # non-empty at every SF by construction
    check(spark, """
        SELECT ps_partkey,
               round(sum(ps_supplycost * ps_availqty), 2) AS value
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY ps_partkey
        HAVING sum(ps_supplycost * ps_availqty) > (
            SELECT sum(ps_supplycost * ps_availqty) * 0.5
                   / count(DISTINCT ps_partkey)
            FROM partsupp
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA')
        ORDER BY value DESC, ps_partkey
    """)
