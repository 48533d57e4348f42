"""Schema config for the driver's TPC-H-ish test star schema (TESTDATA.md).

Plays the role of the reference's introspected schema JSON
(`slicedb schema`, `slice_db/schema.py:6-105`) for the parquet fixtures:
FK edges of the star schema with the direction config a real slice would
use — ``forward`` everywhere (every row pulls the parents it references),
``reverse`` on customer→orders→lineitem (slicing a set of customers pulls
all their orders and line items, like the reference's parent/child fixture
`test/test_dump.py:47-104` scaled up).
"""

from __future__ import annotations

from ..config.model import FORWARD, REVERSE, Reference, SchemaConfig, Sequence, Table


def tpch_schema(reverse_fanout: bool = True) -> SchemaConfig:
    t = {
        "region": Table("region", "region", "public", ["r_regionkey", "r_name"], ["r_regionkey"]),
        "nation": Table(
            "nation", "nation", "public", ["n_nationkey", "n_name", "n_regionkey"], ["n_nationkey"]
        ),
        "customer": Table(
            "customer",
            "customer",
            "public",
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
            ["c_custkey"],
        ),
        "supplier": Table(
            "supplier",
            "supplier",
            "public",
            ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
            ["s_suppkey"],
        ),
        "part": Table(
            "part",
            "part",
            "public",
            ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
            ["p_partkey"],
        ),
        "orders": Table(
            "orders",
            "orders",
            "public",
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
            ["o_orderkey"],
            sequences=["orders_o_orderkey_seq"],
        ),
        "lineitem": Table(
            "lineitem",
            "lineitem",
            "public",
            [
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            ],
            ["l_orderkey", "l_linenumber"],
        ),
    }
    fanout = [FORWARD, REVERSE] if reverse_fanout else [FORWARD]
    refs = [
        Reference("nation_region_fkey", "nation", ["n_regionkey"], "region", ["r_regionkey"]),
        Reference("customer_nation_fkey", "customer", ["c_nationkey"], "nation", ["n_nationkey"]),
        Reference("supplier_nation_fkey", "supplier", ["s_nationkey"], "nation", ["n_nationkey"]),
        Reference("orders_customer_fkey", "orders", ["o_custkey"], "customer", ["c_custkey"], fanout),
        Reference("lineitem_orders_fkey", "lineitem", ["l_orderkey"], "orders", ["o_orderkey"], fanout),
        Reference("lineitem_part_fkey", "lineitem", ["l_partkey"], "part", ["p_partkey"]),
        Reference("lineitem_supplier_fkey", "lineitem", ["l_suppkey"], "supplier", ["s_suppkey"]),
    ]
    seqs = {"orders_o_orderkey_seq": Sequence("orders_o_orderkey_seq", "public", "orders_o_orderkey_seq")}
    return SchemaConfig(tables=t, references={r.id: r for r in refs}, sequences=seqs)


# Single-BIGINT surrogate key expressions for closure auditing (lineitem has
# a composite PK; linenumber < 8 in TPC-H so 8*orderkey+linenumber is
# injective).  Same expressions are used verbatim in the DuckDB oracle.
KEY_EXPRS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey * 8 + l_linenumber",
}
