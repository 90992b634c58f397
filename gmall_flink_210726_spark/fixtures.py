"""Deterministic gmall-shaped fixture generator (FIXTURES.md).

Synthesizes the reference's input streams — behavior-log JSON, CDC
envelopes for business tables, dimension tables, routing config — for
the pipeline tests in tests/. Everything is seeded; repeated calls
produce identical data.

Not used by the driver-facing queries (those run on /root/testdata);
this exists because the reference pipelines need gmall-shaped inputs
the driver tables don't provide (nested JSON logs, CDC envelopes).
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta

EPOCH = datetime(2024, 6, 1, 8, 0, 0)


def _fmt(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def _ms(dt: datetime) -> int:
    return int(dt.timestamp() * 1000)


PAGE_IDS = ["home", "good_list", "good_detail", "cart", "search", "trade", "payment"]
SKUS = [str(i) for i in range(1, 11)]
KEYWORDS = ["apple phone", "red shoes", "spark engine", "blue jacket", "usb cable"]


def gen_log_events(n_visits: int = 120, seed: int = 42) -> list[str]:
    """Behavior-log JSON lines (FIXTURES.md §1): start events, page
    chains with entries (last_page_id null), search pages, good_detail
    pages, display arrays, repeated mids across days, false is_new
    claims, and ~2% malformed lines."""
    rng = random.Random(seed)
    lines: list[str] = []
    mids = [f"mid_{i}" for i in range(20)]
    first_seen: dict[str, datetime] = {}
    for v in range(n_visits):
        mid = rng.choice(mids)
        day = rng.randrange(3)
        t = EPOCH + timedelta(days=day, minutes=rng.randrange(600), seconds=rng.randrange(60))
        is_first = mid not in first_seen
        if is_first:
            first_seen[mid] = t
        common = {
            "mid": mid,
            "vc": rng.choice(["v2.1.111", "v2.1.132"]),
            "ch": rng.choice(["huawei", "xiaomi", "appstore"]),
            "ar": rng.choice(["110000", "310000", "440000"]),
            # the client lies sometimes: claims new on a returning mid
            "is_new": "1" if (is_first or rng.random() < 0.2) else "0",
        }
        # start (launch) event
        if rng.random() < 0.6:
            lines.append(
                json.dumps(
                    {"common": common, "start": {"entry": "icon", "open_ad_id": str(rng.randrange(10))}, "ts": _ms(t)}
                )
            )
            t += timedelta(seconds=rng.randrange(1, 5))
        # page chain
        n_pages = rng.choice([1, 1, 2, 3, 4])
        last_page = None
        for p in range(n_pages):
            page_id = rng.choice(PAGE_IDS)
            page = {
                "page_id": page_id,
                "last_page_id": last_page,
                "item": None,
                "item_type": None,
                "during_time": rng.randrange(1000, 20000),
            }
            if page_id == "search" or last_page == "search":
                page["item"] = rng.choice(KEYWORDS)
                page["item_type"] = "keyword"
            if page_id == "good_detail":
                page["item"] = rng.choice(SKUS)
                page["item_type"] = "sku_id"
            evt = {"common": common, "page": page, "ts": _ms(t)}
            if rng.random() < 0.5:
                evt["displays"] = [
                    {"item": rng.choice(SKUS), "item_type": "sku_id", "pos_id": str(i)}
                    for i in range(rng.randrange(1, 4))
                ]
            lines.append(json.dumps(evt))
            last_page = page_id
            # occasionally a bounce: next event far later (handled by new visit)
            t += timedelta(seconds=rng.choice([5, 10, 30, 90]))
        if v % 40 == 7:  # deterministic sprinkle of malformed lines
            lines.append("{not valid json" + str(v))
    return lines


def gen_business_rows(n_orders: int = 60, seed: int = 43):
    """order_info / order_detail / payment_info rows (FIXTURES.md §3).
    Details within ±5 s of the order (a few outside, must not join);
    payments within [0, 15 s] after the order."""
    rng = random.Random(seed)
    orders, details, payments = [], [], []
    did = pid = 0
    for oid in range(1, n_orders + 1):
        t = EPOCH + timedelta(minutes=rng.randrange(300), seconds=rng.randrange(60))
        user = rng.randrange(1, 21)
        total = round(rng.uniform(20, 500), 2)
        orders.append(
            {
                "id": oid,
                "province_id": rng.randrange(1, 6),
                "order_status": "1001",
                "user_id": user,
                "total_amount": f"{total:.2f}",
                "activity_reduce_amount": "0.00",
                "coupon_reduce_amount": "0.00",
                "original_total_amount": f"{total:.2f}",
                "feight_fee": "5.00",
                "expire_time": "",
                "create_time": _fmt(t),
                "operate_time": "",
            }
        )
        for _ in range(rng.choice([1, 2, 3])):
            did += 1
            # mostly inside ±5 s, some outside (must not join)
            off = rng.choice([-3, -1, 0, 1, 2, 4, 8, 12])
            details.append(
                {
                    "id": did,
                    "order_id": oid,
                    "sku_id": int(rng.choice(SKUS)),
                    "order_price": f"{rng.uniform(5, 100):.2f}",
                    "sku_num": rng.choice([1, 1, 2]),
                    "sku_name": f"sku name {rng.choice(SKUS)}",
                    "create_time": _fmt(t + timedelta(seconds=off)),
                    "split_total_amount": f"{rng.uniform(5, 200):.2f}",
                    "split_activity_amount": "0.00",
                    "split_coupon_amount": "0.00",
                }
            )
        if rng.random() < 0.8:
            pid += 1
            payments.append(
                {
                    "id": pid,
                    "order_id": oid,
                    "user_id": user,
                    "total_amount": f"{total:.2f}",
                    "subject": "order payment",
                    "payment_type": rng.choice(["1101", "1102"]),
                    "create_time": _fmt(t + timedelta(seconds=rng.randrange(0, 15))),
                    "callback_time": "",
                }
            )
    return orders, details, payments


def gen_dims(seed: int = 44):
    rng = random.Random(seed)
    users = [
        {"id": str(i), "birthday": f"19{rng.randrange(60, 99)}-0{rng.randrange(1, 9)}-1{rng.randrange(0, 9)}", "gender": rng.choice(["M", "F"])}
        for i in range(1, 21)
    ]
    provinces = [
        {"id": str(i), "name": n, "area_code": f"{i}10000", "iso_code": f"CN-{i}1", "iso_3166_2": f"CN-A{i}"}
        for i, n in enumerate(["Beijing", "Shanghai", "Guangdong", "Zhejiang", "Jiangsu"], start=1)
    ]
    skus = [
        {"id": s, "sku_name": f"sku name {s}", "price": f"{rng.uniform(10, 200):.2f}",
         "category3_id": str(1 + int(s) % 3), "spu_id": str(1 + int(s) % 4), "tm_id": str(1 + int(s) % 2)}
        for s in SKUS
    ]
    spus = [{"id": str(i), "spu_name": f"spu {i}"} for i in range(1, 5)]
    tms = [{"id": str(i), "tm_name": f"brand {i}"} for i in range(1, 3)]
    c3s = [{"id": str(i), "name": f"category {i}"} for i in range(1, 4)]
    return {
        "dim_user_info": users,
        "dim_base_province": provinces,
        "dim_sku_info": skus,
        "dim_spu_info": spus,
        "dim_base_trademark": tms,
        "dim_base_category3": c3s,
    }


def gen_cdc_envelopes(seed: int = 45) -> list[str]:
    """CDC envelope JSON lines over the business tables, including
    updates and deletes (deletes must be filtered by BaseDB —
    dwd/BaseDBApp.java:55-60)."""
    rng = random.Random(seed)
    orders, details, payments = gen_business_rows()
    lines = []
    for table, rows in (("order_info", orders), ("order_detail", details), ("payment_info", payments)):
        for r in rows:
            lines.append(json.dumps({"database": "gmall", "tableName": table, "before": {}, "after": {k: str(v) for k, v in r.items()}, "type": "insert"}))
    # sprinkle updates + deletes
    for r in rng.sample(orders, 5):
        after = {k: str(v) for k, v in r.items()}
        after["order_status"] = "1002"
        lines.append(json.dumps({"database": "gmall", "tableName": "order_info", "before": {k: str(v) for k, v in r.items()}, "after": after, "type": "update"}))
    for r in rng.sample(orders, 3):
        lines.append(json.dumps({"database": "gmall", "tableName": "order_info", "before": {k: str(v) for k, v in r.items()}, "after": {}, "type": "delete"}))
    return lines


TABLE_PROCESS_RULES = [
    # (FIXTURES.md §5) kafka routes for facts, hbase routes for dims;
    # order_info prunes columns (tests func/TableProcessFunction.java:71-77)
    {"source_table": "order_info", "operate_type": "insert", "sink_type": "kafka",
     "sink_table": "dwd_order_info", "sink_columns": "id,province_id,user_id,total_amount,create_time", "sink_pk": "id", "sink_extend": ""},
    {"source_table": "order_detail", "operate_type": "insert", "sink_type": "kafka",
     "sink_table": "dwd_order_detail", "sink_columns": "id,order_id,sku_id,order_price,sku_num,sku_name,create_time,split_total_amount", "sink_pk": "id", "sink_extend": ""},
    {"source_table": "payment_info", "operate_type": "insert", "sink_type": "kafka",
     "sink_table": "dwd_payment_info", "sink_columns": "id,order_id,user_id,total_amount,payment_type,create_time", "sink_pk": "id", "sink_extend": ""},
]
