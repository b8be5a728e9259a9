"""Deterministic event-graph fixture generator (FIXTURES.md).

Behavioral mirror of the reference's fake-data generator
(pipeline/.../common/fakedatagenerator/LogRequestIterator.java,
LogRequestIteratorOptions.java:22-210 — users → sessions → views →
requests → insertions → impressions → actions with configurable rates,
incrementing ids) — re-written from the documented knobs, not ported.

The generator produces a CONSISTENT graph: every child carries its
ancestors' ids, then the missing_*_rate knobs knock out direct FKs
(keeping less-specific ancestor ids) to exercise the inferred join,
exactly like the reference's missing-view/missing-impression options.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

from openmetrics_spark.schemas import (
    ADD_TO_CART,
    CHECKOUT,
    EVENT_SCHEMAS,
    NAVIGATE,
    PURCHASE,
    TRAFFIC_PRODUCTION,
    TRAFFIC_SHADOW,
)

BOT_UA = "Mozilla/5.0 (compatible; Googlebot/2.1)"
REAL_UA = "Mozilla/5.0 (X11; Linux x86_64) Chrome/120.0"
QUERIES = ["shoes", "red dress", "laptop", "coffee", "garden hose", None]


@dataclass
class FixtureOptions:
    users: int = 10
    auto_view_rate: float = 0.3
    diagnostics_rate: float = 0.3
    sessions_per_user: int = 1
    views_per_session: int = 2
    requests_per_view: int = 2
    response_insertions_per_request: int = 5
    insertion_impressed_rate: float = 0.5
    impression_navigate_rate: float = 0.3
    navigate_add_to_cart_rate: float = 0.3
    navigate_checkout_rate: float = 0.3
    checkout_purchase_rate: float = 0.5
    missing_view_rate: float = 0.1
    missing_delivery_log_rate: float = 0.1
    missing_impression_rate: float = 0.1
    redundant_impression_rate: float = 0.1
    shadow_traffic_rate: float = 0.1
    sdk_duplicate_rate: float = 0.1  # SDK row sharing client_request_id
    bot_rate: float = 0.05
    duplicate_event_rate: float = 0.05
    stores: int = 10
    items_per_store: int = 10
    max_delay_ms: int = 60_000
    base_ts: int = 1_700_000_000_000
    platform_id: int = 1
    seed: int = 42


@dataclass
class Fixtures:
    user: list[dict] = field(default_factory=list)
    view: list[dict] = field(default_factory=list)
    auto_view: list[dict] = field(default_factory=list)
    cohort_membership: list[dict] = field(default_factory=list)
    diagnostics: list[dict] = field(default_factory=list)
    delivery_log: list[dict] = field(default_factory=list)
    impression: list[dict] = field(default_factory=list)
    action: list[dict] = field(default_factory=list)
    content: list[dict] = field(default_factory=list)
    log_user_user: list[dict] = field(default_factory=list)

    def tables(self) -> dict[str, list[dict]]:
        return {
            "user": self.user,
            "view": self.view,
            "auto_view": self.auto_view,
            "cohort_membership": self.cohort_membership,
            "diagnostics": self.diagnostics,
            "delivery_log": self.delivery_log,
            "impression": self.impression,
            "action": self.action,
            "content": self.content,
            "log_user_user": self.log_user_user,
        }


def _ts(base: int, rng: random.Random, opt: FixtureOptions) -> tuple[int, int]:
    """(event_api_timestamp, log_timestamp) with small skew."""
    api = base
    log = api + rng.randint(0, 2000)
    return api, log


def generate(opt: FixtureOptions | None = None) -> Fixtures:
    opt = opt or FixtureOptions()
    rng = random.Random(opt.seed)
    # independent stream for the envelope-only types (auto_view,
    # cohort_membership, diagnostics): keeps the core event graph
    # byte-identical to pre-8-way-split fixtures for any seed
    rng2 = random.Random(opt.seed + 1)
    fx = Fixtures()
    counters = {k: 0 for k in "usvdriawm"}

    def nid(kind: str) -> str:
        counters[kind] += 1
        return f"{kind}-{counters[kind]:08d}"

    contents = []
    for s in range(opt.stores):
        for i in range(opt.items_per_store):
            cid = f"c-{s:03d}-{i:03d}"
            contents.append(cid)
            fx.content.append(
                {
                    "content_id": cid,
                    "store_id": f"store-{s:03d}",
                    "promotion_ids": [f"promo-{s:03d}-{i:03d}-{p}" for p in range(2)],
                }
            )

    now = opt.base_ts
    for _u in range(opt.users):
        log_user_id = nid("u")
        user_id = f"auth-{log_user_id}"
        now += rng.randint(1000, opt.max_delay_ms)
        api, log = _ts(now, rng, opt)
        row = {
            "platform_id": opt.platform_id,
            "log_user_id": log_user_id,
            "user_id": user_id,
            "log_timestamp": log,
            "event_api_timestamp": api,
        }
        fx.user.append(row)
        if rng.random() < opt.duplicate_event_rate:
            fx.user.append(dict(row, log_timestamp=log + 1))
        fx.log_user_user.append(
            {
                "platform_id": opt.platform_id,
                "log_user_id": log_user_id,
                "user_id": user_id,
                "event_time_millis": log,
            }
        )
        fx.cohort_membership.append(
            {
                "platform_id": opt.platform_id,
                "membership_id": nid("m"),
                "cohort_id": f"exp-{_u % 3}",
                "arm": _u % 2 + 1,  # TREATMENT/CONTROL
                "log_user_id": log_user_id,
                "log_timestamp": log,
                "event_api_timestamp": api,
            }
        )
        if rng2.random() < opt.diagnostics_rate:
            fx.diagnostics.append(
                {
                    "platform_id": opt.platform_id,
                    "log_user_id": log_user_id,
                    "device": rng2.choice(["ios", "android", "web"]),
                    "diagnostics_json": '{"battery": %d}' % rng2.randint(1, 100),
                    "log_timestamp": log + 5,
                    "event_api_timestamp": api + 5,
                }
            )
        is_bot = rng.random() < opt.bot_rate
        ua = BOT_UA if is_bot else REAL_UA

        for _s in range(opt.sessions_per_user):
            session_id = nid("s")
            for _v in range(opt.views_per_session):
                view_id = nid("v")
                now += rng.randint(1000, opt.max_delay_ms)
                api, log = _ts(now, rng, opt)
                vrow = {
                    "platform_id": opt.platform_id,
                    "view_id": view_id,
                    "session_id": session_id,
                    "log_user_id": log_user_id,
                    "user_agent": ua,
                    "name": f"page-{view_id}",
                    "content_id": None,
                    "log_timestamp": log,
                    "event_api_timestamp": api,
                }
                fx.view.append(vrow)
                if rng.random() < opt.duplicate_event_rate:
                    fx.view.append(dict(vrow, log_timestamp=log + 1))

                if rng2.random() < opt.auto_view_rate:
                    fx.auto_view.append(
                        {
                            "platform_id": opt.platform_id,
                            "auto_view_id": nid("w"),
                            "view_id": view_id,
                            "session_id": session_id,
                            "log_user_id": log_user_id,
                            "name": f"auto-{view_id}",
                            "content_id": rng2.choice(contents),
                            "log_timestamp": log + 10,
                            "event_api_timestamp": api + 10,
                        }
                    )

                for _r in range(opt.requests_per_view):
                    request_id = nid("d")
                    client_request_id = f"cr-{request_id}"
                    now += rng.randint(500, opt.max_delay_ms)
                    api, log = _ts(now, rng, opt)
                    insertions = []
                    for pos in range(opt.response_insertions_per_request):
                        insertions.append(
                            {
                                "insertion_id": nid("r"),
                                "content_id": rng.choice(contents),
                                "position": pos,
                                "retrieval_rank": pos,
                            }
                        )
                    missing_view = rng.random() < opt.missing_view_rate
                    drow = {
                        "platform_id": opt.platform_id,
                        "request_id": request_id,
                        "client_request_id": client_request_id,
                        "view_id": None if missing_view else view_id,
                        "session_id": session_id,
                        "log_user_id": log_user_id,
                        "search_query": rng.choice(QUERIES),
                        "user_agent": ua,
                        "traffic_type": TRAFFIC_PRODUCTION,
                        "api_execution": True,
                        "response_insertions": insertions,
                        "log_timestamp": log,
                        "event_api_timestamp": api,
                    }
                    fx.delivery_log.append(drow)
                    if rng.random() < opt.sdk_duplicate_rate:
                        # SDK fallback row: same client_request_id,
                        # slightly later, loses to API on priority
                        fx.delivery_log.append(
                            dict(
                                drow,
                                request_id=nid("d"),
                                api_execution=False,
                                log_timestamp=log + rng.randint(1, 1500),
                            )
                        )
                    if rng.random() < opt.shadow_traffic_rate:
                        fx.delivery_log.append(
                            dict(
                                drow,
                                request_id=nid("d"),
                                client_request_id=f"cr-{nid('d')}",
                                traffic_type=TRAFFIC_SHADOW,
                                log_timestamp=log + 1,
                            )
                        )

                    for ins in insertions:
                        if rng.random() >= opt.insertion_impressed_rate:
                            continue
                        impression_id = nid("i")
                        now += rng.randint(200, 5000)
                        api, log = _ts(now, rng, opt)
                        missing_imp_fk = rng.random() < opt.missing_impression_rate
                        irow = {
                            "platform_id": opt.platform_id,
                            "impression_id": impression_id,
                            "insertion_id": None if missing_imp_fk else ins["insertion_id"],
                            "request_id": None if missing_view else request_id,
                            "view_id": None if missing_view else view_id,
                            "session_id": session_id,
                            "log_user_id": log_user_id,
                            "content_id": ins["content_id"],
                            "log_timestamp": log,
                            "event_api_timestamp": api,
                        }
                        fx.impression.append(irow)
                        if rng.random() < opt.duplicate_event_rate:
                            fx.impression.append(dict(irow, log_timestamp=log + 1))
                        if rng.random() < opt.redundant_impression_rate:
                            fx.impression.append(
                                dict(
                                    irow,
                                    impression_id=nid("i"),
                                    log_timestamp=log + rng.randint(1, 3000),
                                )
                            )

                        if rng.random() >= opt.impression_navigate_rate:
                            continue
                        nav_id = nid("a")
                        now += rng.randint(200, 10_000)
                        api, log = _ts(now, rng, opt)
                        missing_action_fk = rng.random() < opt.missing_delivery_log_rate
                        arow = {
                            "platform_id": opt.platform_id,
                            "action_id": nav_id,
                            "impression_id": None if missing_action_fk else impression_id,
                            "insertion_id": None if missing_action_fk else ins["insertion_id"],
                            "request_id": None if missing_view else request_id,
                            "view_id": None if missing_view else view_id,
                            "session_id": session_id,
                            "log_user_id": log_user_id,
                            "content_id": ins["content_id"],
                            "action_type": NAVIGATE,
                            "custom_action_type": None,
                            "cart": None,
                            "properties_json": json.dumps(
                                {"store_id": fx.content[contents.index(ins["content_id"])]["store_id"]}
                            ),
                            "log_timestamp": log,
                            "event_api_timestamp": api,
                        }
                        fx.action.append(arow)

                        if rng.random() < opt.navigate_add_to_cart_rate:
                            now += rng.randint(200, 10_000)
                            api, log = _ts(now, rng, opt)
                            fx.action.append(
                                dict(
                                    arow,
                                    action_id=nid("a"),
                                    action_type=ADD_TO_CART,
                                    log_timestamp=log,
                                    event_api_timestamp=api,
                                )
                            )
                        if rng.random() < opt.navigate_checkout_rate:
                            now += rng.randint(200, 10_000)
                            api, log = _ts(now, rng, opt)
                            cart = [
                                {
                                    "content_id": ins["content_id"],
                                    "quantity": rng.randint(1, 3),
                                    "price_usd_micros_per_unit": rng.randint(1, 100)
                                    * 1_000_000,
                                }
                            ]
                            if rng.random() < 0.5:
                                cart.append(
                                    {
                                        "content_id": rng.choice(contents),
                                        "quantity": rng.randint(1, 2),
                                        "price_usd_micros_per_unit": rng.randint(1, 50)
                                        * 1_000_000,
                                    }
                                )
                            crow = dict(
                                arow,
                                action_id=nid("a"),
                                action_type=CHECKOUT,
                                cart=cart,
                                log_timestamp=log,
                                event_api_timestamp=api,
                            )
                            fx.action.append(crow)
                            if rng.random() < opt.checkout_purchase_rate:
                                now += rng.randint(200, 10_000)
                                api, log = _ts(now, rng, opt)
                                fx.action.append(
                                    dict(
                                        crow,
                                        action_id=nid("a"),
                                        action_type=PURCHASE,
                                        log_timestamp=log,
                                        event_api_timestamp=api,
                                    )
                                )
    return fx


def to_spark(spark, fx: Fixtures) -> dict:
    """Materialize fixture tables as DataFrames with the fixed schemas
    and register `fx_<name>` temp views."""
    out = {}
    for name, rows in fx.tables().items():
        df = spark.createDataFrame(rows, EVENT_SCHEMAS[name])
        df.createOrReplaceTempView(f"fx_{name}")
        out[name] = df
    return out


def write_parquet(spark, fx: Fixtures, out_dir: str) -> None:
    for name, df in to_spark(spark, fx).items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
