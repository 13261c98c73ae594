"""D5 grammar-coverage quantification vs dateutil (VERDICT r2 item 7).

The reference accepts anything ``dateutil.parser.parse`` does
(lib/DataProcessor.py:142-148); the engine's declarative chain covers
a pinned format list (DIVERGENCES #12). This fuzz measures, over a
structured corpus spanning dateutil's grammar, (a) what fraction of
dateutil-parseable strings the chain parses, and (b) that every
co-parsed string agrees with dateutil's value outside the documented
ambiguous-date divergence classes — i.e. the chain never silently
MIS-parses, it only declines the exotic tail.
"""

from datetime import datetime

import pytest
from dateutil import parser as du_parser

from far_finer_airtable_firestore_sync_spark.plans.join_queries import (
    parse_datetime_any,
)

# Documented residual classes (DIVERGENCES #12): dateutil parses these,
# the pinned chain deliberately does not (or reads them differently).
RESIDUAL_CLASSES = {
    "two-digit-year",  # '12/23/99': dateutil's 50-year window is not
    #                    reproducible cross-engine (Spark yyyy rejects
    #                    2 digits; DuckDB %Y would read year 0099)
    "ctime",           # 'Tue Dec 23 10:00:00 2024': Spark's parser
    #                    cannot parse day-of-week fields (EEE)
    "time-only",       # '10:00' (dateutil fills in *today* — wall
    #                    clock at parse time, nondeterministic)
    "ordinal",         # '23rd Dec 2024' (no ordinal-suffix pattern)
}

# Ambiguous numeric dates where BOTH parse but pick different
# day/month orders: dateutil is month-first for '.' dates with both
# fields <= 12, the chain pins dd.MM (EU convention for dotted forms).
AMBIGUOUS_AGREEMENT_EXEMPT = {"dotted-ambiguous"}


def _corpus() -> list[tuple[str, str]]:
    """(class, string) pairs spanning dateutil's practical grammar."""
    out = [
        # --- pinned-format classes (chain MUST parse these) ---
        ("iso-date", "2024-12-23"),
        ("iso-dt", "2024-12-23T10:11:12"),
        ("iso-dt-space", "2024-12-23 10:11:12"),
        ("iso-frac3", "2024-12-23T10:11:12.123"),
        ("iso-frac6", "2024-12-23T10:11:12.123456"),
        ("iso-frac9", "2024-12-23T10:11:12.123456789"),
        ("iso-z", "2024-12-23T10:11:12Z"),
        ("iso-fracz", "2024-12-23T10:11:12.500Z"),
        ("iso-offset", "2024-12-23T10:11:12+05:30"),
        ("iso-frac-offset", "2024-12-23T10:11:12.250000-08:00"),
        ("us-slash", "12/23/2024 10:11:12"),
        ("slash-iso", "2024/12/23"),
        ("dotted", "23.12.2024"),
        ("month-abbrev", "23 Dec 2024"),
        ("month-abbrev-us", "Dec 23, 2024"),
        # --- ambiguous both-parse class ---
        ("dotted-ambiguous", "01.02.2024"),
        # --- widened classes (added to the chain by the r3 coverage
        #     fuzz; dateutil-compatible values asserted below) ---
        ("full-month-name", "December 23, 2024"),
        ("full-month-name", "23 December 2024"),
        ("no-comma-month", "Dec 23 2024"),
        ("compact", "20241223"),
        ("compact", "2024.12.23"),
        ("dash-us", "12-23-2024"),
        ("us-slash-date", "12/23/2024"),
        ("ampm", "12/23/2024 10:11 PM"),
        ("ampm", "01/02/2024 09:05 AM"),
        # --- residual tail (dateutil-only; chain declines) ---
        ("two-digit-year", "12/23/99"),
        ("ctime", "Tue Dec 23 10:11:12 2024"),
        ("time-only", "10:11"),
        ("ordinal", "23rd Dec 2024"),
    ]
    # widen the pinned classes with seeded variation (every month,
    # boundary days/times) so coverage isn't a single-example claim
    for m in range(1, 13):
        out.append(("iso-date", f"2023-{m:02d}-28"))
        out.append(("iso-dt", f"2023-{m:02d}-05T23:59:59"))
        out.append(("us-slash", f"{m:02d}/28/2023 00:00:01"))
        out.append(("dotted", f"28.{m:02d}.2023"))
        out.append(
            ("month-abbrev-us",
             datetime(2023, m, 15).strftime("%b %d, %Y"))
        )
        out.append(
            ("month-abbrev", datetime(2023, m, 15).strftime("%d %b %Y"))
        )
        out.append(("iso-fracz", f"2023-{m:02d}-15T06:07:08.{m:03d}Z"))
    return out


@pytest.fixture(scope="module")
def results(spark):
    corpus = _corpus()
    du = {}
    for cls, s in corpus:
        try:
            du[s] = du_parser.parse(s)
        except (ValueError, OverflowError):
            pass
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([(s,) for _, s in corpus], "raw string")
    ours = {
        r["raw"]: r["p"]
        for r in df.selectExpr(
            "raw", f"{parse_datetime_any('raw')} as p"
        ).collect()
    }
    return corpus, du, ours


def test_coverage_fraction_vs_dateutil(results):
    """The chain parses >= 95% of the dateutil-parseable corpus, and
    100% of the pinned-format classes."""
    corpus, du, ours = results
    parseable = [(c, s) for c, s in corpus if s in du]
    covered = [(c, s) for c, s in parseable if ours.get(s) is not None]
    frac = len(covered) / len(parseable)
    assert frac >= 0.95, f"coverage {frac:.2%} ({len(covered)}/{len(parseable)})"
    pinned_missed = [
        (c, s)
        for c, s in parseable
        if c not in RESIDUAL_CLASSES and ours.get(s) is None
    ]
    assert pinned_missed == [], pinned_missed


def test_residual_tail_is_exactly_the_documented_classes(results):
    """Everything the chain declines belongs to a documented residual
    class — no undocumented grammar gaps."""
    corpus, du, ours = results
    undocumented = {
        c
        for c, s in corpus
        if s in du and ours.get(s) is None and c not in RESIDUAL_CLASSES
    }
    assert undocumented == set()


def test_no_silent_misparse_vs_dateutil(results):
    """Where both parsers succeed, values agree (UTC wall-clock) except
    in the documented ambiguous-order classes."""
    corpus, du, ours = results
    for cls, s in corpus:
        if cls in AMBIGUOUS_AGREEMENT_EXEMPT or cls in RESIDUAL_CLASSES:
            continue
        if s in du and ours.get(s) is not None:
            d = du[s]
            if d.tzinfo is not None:
                from datetime import timezone

                d = d.astimezone(timezone.utc).replace(tzinfo=None)
            # dateutil keeps full precision; chain pins to microseconds
            assert ours[s] == d, (cls, s, ours[s], d)


def test_dotted_ambiguous_divergence_is_the_documented_one(results):
    """'01.02.2024': dateutil reads month-first (Jan 2), the chain pins
    dd.MM (Feb 1) — exactly the DIVERGENCES #12 dotted-date rule."""
    _, du, ours = results
    s = "01.02.2024"
    assert du[s] == datetime(2024, 1, 2)
    assert ours[s] == datetime(2024, 2, 1)
