"""Deterministic fixture generator (seed=42) — FIXTURES.md shapes.

Mirrors the reference's actual input surface: Yelp Open Dataset
NDJSON (nested structs, comma-joined lists, dirty field names) and
Las Vegas climate CSVs (jagged rows, quoted newlines, 'T' trace
sentinel). Run once; outputs are committed under fixtures/ so every
session (and the driver's oracle) sees identical bytes.
"""

from __future__ import annotations

import csv
import io
import json
import random
from datetime import datetime, timedelta
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures"
rng = random.Random(42)

CITIES = ["Las Vegas", "Henderson", "North Las Vegas", "Boulder City", "Paradise"]
STATES = ["NV", "AZ", "CA"]
WORDS = (
    "good great tasty awful slow friendly clean dirty cozy loud quiet cheap "
    "pricey fresh stale amazing terrible okay decent superb bland spicy sweet "
    "salty crispy soggy warm cold fast rude helpful"
).split()
CATEGORIES = ["Restaurants", "Bars", "Coffee & Tea", "Pizza", "Nightlife", "Casinos", "Buffets"]


def _bid(i: int) -> str:
    return f"b{'%021d' % i}"


def _uid(i: int) -> str:
    return f"u{'%021d' % i}"


def _dt(i: int) -> str:
    base = datetime(2019, 1, 1, 8, 0, 0)
    return (base + timedelta(hours=i * 7 % 26280, minutes=i % 60)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _text(n_words: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n_words))


def write_ndjson(name: str, rows: list[dict]) -> None:
    with open(OUT / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"{name}: {len(rows)} rows")


def gen_business(n: int = 1000) -> list[dict]:
    rows = []
    for i in range(n):
        attrs = None
        if rng.random() > 0.2:
            attrs = {
                "WiFi": rng.choice(["u'free'", "u'no'", "u'paid'", None]),
                "RestaurantsPriceRange2": rng.choice(["1", "2", "3", "4", None]),
                "BikeParking": rng.choice(["True", "False"]),
                "BusinessParking": json.dumps(
                    {
                        "garage": rng.random() > 0.5,
                        "street": rng.random() > 0.5,
                        "lot": rng.random() > 0.5,
                    }
                ),
            }
        hours = None
        if rng.random() > 0.3:
            hours = {
                d: f"{rng.randint(6, 11)}:0-{rng.randint(17, 23)}:0"
                for d in ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]
            }
        rows.append(
            {
                "business_id": _bid(i),
                "name": rng.choice(
                    [f"Cafe \"{_text(1).title()}\"", f"{_text(1).title()} Grill", f"Chez {_text(1).title()} é"]
                ),
                "address": f"{rng.randint(1, 9999)} {_text(1).title()} St",
                "city": rng.choice(CITIES),
                "state": rng.choice(STATES),
                "postal_code": f"{rng.randint(88901, 89199)}",
                "latitude": round(35.9 + rng.random() * 0.4, 6),
                "longitude": round(-115.4 + rng.random() * 0.5, 6),
                "stars": rng.randint(2, 10) / 2.0,
                "review_count": rng.randint(3, 900),
                "is_open": rng.randint(0, 1),
                "attributes": attrs,
                "categories": ", ".join(rng.sample(CATEGORIES, rng.randint(1, 3))),
                "hours": hours,
            }
        )
    return rows


def gen_review(n: int = 5000, n_biz: int = 1000, n_users: int = 1000) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "review_id": f"r{'%021d' % i}",
                "user_id": _uid(rng.randrange(n_users)),
                "business_id": _bid(rng.randrange(n_biz)),
                "stars": float(rng.randint(1, 5)),
                "useful": rng.randint(0, 50),
                "funny": rng.randint(0, 20),
                "cool": rng.randint(0, 20),
                "text": _text(rng.randint(8, 60)) + ("\nGreat spot! \U0001f355" if rng.random() < 0.2 else ""),
                "date": _dt(i),
            }
        )
    # ~2% exact duplicates (new review_id, same content)
    for i in range(n // 50):
        src = dict(rows[rng.randrange(n)])
        src["review_id"] = f"r{'%021d' % (n + i)}"
        rows.append(src)
    # ~2% near duplicates (one word changed)
    for i in range(n // 50):
        src = dict(rows[rng.randrange(n)])
        src["review_id"] = f"r{'%021d' % (n * 2 + i)}"
        words = src["text"].split(" ")
        words[rng.randrange(len(words))] = rng.choice(WORDS)
        src["text"] = " ".join(words)
        rows.append(src)
    return rows


def gen_user(n: int = 1000) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "user_id": _uid(i),
                "name": rng.choice(["Ana", "Bo", "Cy", "Dee", "Ed", "Floë"]) ,
                "review_count": rng.randint(1, 2000),
                "yelping_since": _dt(i * 3),
                "friends": ", ".join(_uid(rng.randrange(n)) for _ in range(rng.randint(0, 8))),
                "useful": rng.randint(0, 5000),
                "funny": rng.randint(0, 2000),
                "cool": rng.randint(0, 2000),
                "fans": rng.randint(0, 300),
                "elite": ", ".join(str(y) for y in sorted(rng.sample(range(2010, 2022), rng.randint(0, 4)))),
                "average_stars": round(1 + rng.random() * 4, 2),
                "compliment_hot": rng.randint(0, 100),
                "compliment_more": rng.randint(0, 50),
                "compliment_writer": rng.randint(0, 50),
            }
        )
    return rows


def gen_tip(n: int = 1000) -> list[dict]:
    return [
        {
            "user_id": _uid(rng.randrange(1000)),
            "business_id": _bid(rng.randrange(1000)),
            "text": _text(rng.randint(3, 15)),
            "date": _dt(i * 2),
            "compliment_count": rng.randint(0, 6),
        }
        for i in range(n)
    ]


def gen_checkin(n: int = 800) -> list[dict]:
    return [
        {
            "business_id": _bid(i),
            "date": ", ".join(sorted(_dt(rng.randrange(20000)) for _ in range(rng.randint(1, 25)))),
        }
        for i in range(n)
    ]


def gen_covid(n: int = 1000) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "business_id": _bid(i),
                "highlights": _text(rng.randint(0, 6)),
                "delivery or takeout": rng.choice(["TRUE", "FALSE"]),
                "Grubhub enabled": rng.choice(["TRUE", "FALSE"]),
                "Call To Action enabled": rng.choice(["TRUE", "FALSE"]),
                "Request a Quote Enabled": rng.choice(["TRUE", "FALSE"]),
                "Covid Banner": rng.choice(["", _text(5)]),
                "Temporary Closed Until": rng.choice(["", "2020-06-01", "2020-09-15"]),
                "Virtual Services Offered": rng.choice(["", "classes", "tours"]),
                "1st_case_date": "2020-03-%02d" % rng.randint(1, 31),
                "safety measures": {
                    "mask required": rng.choice(["TRUE", "FALSE"]),
                    "6ft rule": rng.choice(["TRUE", "FALSE"]),
                },
            }
        )
    return rows


def gen_precip(days: int = 366) -> str:
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["date", "precipitation inch", "precipitation normal inch"])
    base = datetime(2020, 1, 1)
    jagged_at = {50, 120, 200, 260, 330}
    for i in range(days):
        d = (base + timedelta(days=i)).strftime("%Y%m%d")
        p = rng.choice(["0.00", "T", "%.2f" % (rng.random() * 1.4), "0.01"])
        norm_v = "%.3f" % (rng.random() * 0.2)
        if i in jagged_at:
            # jagged: missing last column ('\r\n' to match csv.writer's
            # record terminator — a bare '\n' would be in-field data to
            # a multiLine parser)
            buf.write(f"{d},{p}\r\n")
        elif i == 180:
            w.writerow([d, f"{p}\nnote: trace day", norm_v])  # quoted newline
        else:
            w.writerow([d, p, norm_v])
    return buf.getvalue()


def gen_temper(days: int = 366) -> str:
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(
        [
            "date",
            "min temperature degreeF",
            "max temperature degreeF",
            "normal min temperature degreeF",
            "normal max temperature degreeF",
        ]
    )
    base = datetime(2020, 1, 1)
    for i in range(days):
        d = (base + timedelta(days=i)).strftime("%Y%m%d")
        lo = rng.randint(30, 80)
        w.writerow([d, lo, lo + rng.randint(5, 30), "%.1f" % (lo - rng.random() * 5), "%.1f" % (lo + 20 + rng.random() * 5)])
    return buf.getvalue()


def gen_upsert() -> None:
    target = [
        {"id": f"k{i:05d}", "val": f"old_{rng.randrange(100)}", "updated_at": "2024-01-01 00:00:00"}
        for i in range(600)
    ]
    batch_a = [
        {"id": f"k{i:05d}", "val": f"new_{rng.randrange(100)}", "updated_at": "2024-02-01 00:00:00"}
        for i in range(300, 900)  # 300 overlap (update), 300 new (insert)
    ]
    write_ndjson("upsert_target.ndjson", target)
    write_ndjson("upsert_batch_a.ndjson", batch_a)


def main() -> None:
    OUT.mkdir(exist_ok=True)
    biz = gen_business()
    write_ndjson("yelp_business.ndjson", biz)
    # multiline variant: a JSON *array of objects* in one file
    # (the reference detects and rewrites these, `main.py:249-252`)
    with open(OUT / "yelp_business_array.json", "w") as f:
        json.dump(biz[:200], f, indent=1)
    print("yelp_business_array.json: 200 rows")
    write_ndjson("yelp_review.ndjson", gen_review())
    write_ndjson("yelp_user.ndjson", gen_user())
    write_ndjson("yelp_tip.ndjson", gen_tip())
    write_ndjson("yelp_checkin.ndjson", gen_checkin())
    write_ndjson("yelp_covid.ndjson", gen_covid())
    (OUT / "lv_precipitation.csv").write_text(gen_precip())
    print("lv_precipitation.csv")
    (OUT / "lv_temperature.csv").write_text(gen_temper())
    print("lv_temperature.csv")
    gen_upsert()


if __name__ == "__main__":
    main()
