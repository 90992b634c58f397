"""Explicit StructTypes for every gmall stream/table shape (FIXTURES.md).

The reference parses everything dynamically with fastjson
(dwd/BaseLogApp.java:52-63) or into Lombok POJOs (bean/*.java). Here
every stream has a declared schema so Catalyst can prune/pushdown and
``from_json`` can fail rows into the corrupt-record column instead of
throwing.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MONEY = DecimalType(16, 2)  # BigDecimal money (bean/OrderInfo.java:17-21)


def _s(name: str) -> StructField:
    return StructField(name, StringType())


def _l(name: str) -> StructField:
    return StructField(name, LongType())


def _m(name: str) -> StructField:
    return StructField(name, MONEY)


# ---------------------------------------------------------------- behavior log
# One JSON object per event (FIXTURES.md §1; field sources cited there).
COMMON_SCHEMA = StructType([_s("mid"), _s("vc"), _s("ch"), _s("ar"), _s("is_new")])
PAGE_SCHEMA = StructType(
    [_s("page_id"), _s("last_page_id"), _s("item"), _s("item_type"), _l("during_time")]
)
DISPLAY_SCHEMA = StructType([_s("item"), _s("item_type"), _s("pos_id")])
LOG_EVENT_SCHEMA = StructType(
    [
        StructField("common", COMMON_SCHEMA),
        StructField("page", PAGE_SCHEMA),
        StructField("displays", ArrayType(DISPLAY_SCHEMA)),
        StructField("start", MapType(StringType(), StringType())),
        _l("ts"),
    ]
)

# ---------------------------------------------------------------- CDC envelope
# {database, tableName, before, after, type} built at
# ods/Flink_CDCWithCustomerSchema_Ods.java:110-116.
CDC_ENVELOPE_SCHEMA = StructType(
    [
        _s("database"),
        _s("tableName"),
        StructField("before", MapType(StringType(), StringType())),
        StructField("after", MapType(StringType(), StringType())),
        _s("type"),
    ]
)

# ------------------------------------------------------------- business tables
# bean/OrderInfo.java:13-27
ORDER_INFO_SCHEMA = StructType(
    [
        _l("id"),
        _l("province_id"),
        _s("order_status"),
        _l("user_id"),
        _m("total_amount"),
        _m("activity_reduce_amount"),
        _m("coupon_reduce_amount"),
        _m("original_total_amount"),
        _m("feight_fee"),
        _s("expire_time"),
        _s("create_time"),
        _s("operate_time"),
    ]
)

# bean/OrderDetail.java:10-20
ORDER_DETAIL_SCHEMA = StructType(
    [
        _l("id"),
        _l("order_id"),
        _l("sku_id"),
        _m("order_price"),
        _l("sku_num"),
        _s("sku_name"),
        _s("create_time"),
        _m("split_total_amount"),
        _m("split_activity_amount"),
        _m("split_coupon_amount"),
    ]
)

# bean/PaymentInfo.java:9-16
PAYMENT_INFO_SCHEMA = StructType(
    [
        _l("id"),
        _l("order_id"),
        _l("user_id"),
        _m("total_amount"),
        _s("subject"),
        _s("payment_type"),
        _s("create_time"),
        _s("callback_time"),
    ]
)

# dws/ProductStatsApp.java:144-185 side streams
CART_INFO_SCHEMA = StructType([_l("sku_id"), _s("create_time")])
FAVOR_INFO_SCHEMA = StructType([_l("sku_id"), _s("create_time")])
ORDER_REFUND_INFO_SCHEMA = StructType(
    [_l("order_id"), _l("sku_id"), _m("refund_amount"), _s("create_time")]
)
COMMENT_INFO_SCHEMA = StructType([_l("sku_id"), _s("appraise"), _s("create_time")])

# -------------------------------------------------------------------- dims
# FIXTURES.md §4; attributes from the async-join call sites.
DIM_USER_INFO_SCHEMA = StructType([_s("id"), _s("birthday"), _s("gender")])
DIM_BASE_PROVINCE_SCHEMA = StructType(
    [_s("id"), _s("name"), _s("area_code"), _s("iso_code"), _s("iso_3166_2")]
)
DIM_SKU_INFO_SCHEMA = StructType(
    [_s("id"), _s("sku_name"), StructField("price", MONEY), _s("category3_id"), _s("spu_id"), _s("tm_id")]
)
DIM_SPU_INFO_SCHEMA = StructType([_s("id"), _s("spu_name")])
DIM_BASE_TRADEMARK_SCHEMA = StructType([_s("id"), _s("tm_name")])
DIM_BASE_CATEGORY3_SCHEMA = StructType([_s("id"), _s("name")])

# ------------------------------------------------------------------ config
# bean/TableProcess.java:12-24
TABLE_PROCESS_SCHEMA = StructType(
    [
        _s("source_table"),
        _s("operate_type"),
        _s("sink_type"),
        _s("sink_table"),
        _s("sink_columns"),
        _s("sink_pk"),
        _s("sink_extend"),
    ]
)
