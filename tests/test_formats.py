"""VBA format-string interpreter tests (jar!mondrian/util/Format subset;
format fixtures MondrianTest.xml:98-127)."""

import datetime

from mondrian_olap_spark.formats import format_value
from mondrian_olap_spark.model import Measure
from mondrian_olap_spark.query import Query


def test_thousands_pattern():
    assert format_value(1234567.891, "#,##0.00") == "1,234,567.89"
    assert format_value(1234567, "#,##0") == "1,234,567"


def test_optional_decimals():
    assert format_value(1.5, "#,##0.##") == "1.5"
    assert format_value(1.0, "#,##0.##") == "1"
    assert format_value(1.25, "0.0") == "1.2"  # banker's-ish via round()


def test_named_formats():
    assert format_value(0.4567, "Percent") == "45.67%"
    assert format_value(3.1, "Fixed") == "3.10"
    assert format_value(1234.5, "Currency") == "$1,234.50"


def test_percent_pattern():
    assert format_value(0.123, "0.0%") == "12.3%"


def test_currency_prefix():
    assert format_value(20.12, "$#,##0.00") == "$20.12"


def test_negative_and_sections():
    assert format_value(-5.5, "0.00") == "-5.50"
    assert format_value(-5.5, "0.00;(0.00)") == "(5.50)"
    assert format_value(0, "0.00;(0.00);zero") == "zero"


def test_null_and_plain():
    assert format_value(None, "#,##0.00") == ""
    assert format_value("abc", "#,##0.00") == "abc"
    assert format_value(7, None) == "7"


def test_leading_zero_dropped_for_hash_only():
    assert format_value(0.5, "#.##") == ".5"
    assert format_value(0.5, "0.##") == "0.5"


def test_date_tokens():
    d = datetime.date(2010, 3, 7)
    assert format_value(d, "dd.mm.yyyy") == "07.03.2010"
    ts = datetime.datetime(2010, 3, 7, 9, 5, 2)
    assert format_value(ts, "yyyy-mm-dd hh:nn:ss") == "2010-03-07 09:05:02"


def test_formatted_values_through_query(engine):
    q = (
        Query(engine)
        .with_member("Pretty Price")
        .as_("sum_price", format_string="#,##0.00", output="pretty_price")
        .columns("[Measures].[Pretty Price]")
        .rows("[Customer].children")
    )
    r = q.execute()
    vals = r.formatted_values
    assert len(vals) == 5
    for row in vals:
        assert "," in row[0] and row[0].count(".") == 1


def test_zero_pad_with_grouping():
    """'0'-placeholder min width survives grouping: '0,000' on 5 → '0,005'
    (VBA padding + thousands separators)."""
    from mondrian_olap_spark.formats import format_value

    assert format_value(5, "0,000") == "0,005"
    assert format_value(1234567, "#,##0") == "1,234,567"
    assert format_value(-5, "0,000") == "-0,005"


def test_locale_number_separators():
    """Numeric separators follow the locale like Java's DecimalFormat under
    the connection Locale (connection.rb:213-223): de swaps to 1.234,50."""
    from mondrian_olap_spark.formats import format_value

    assert format_value(1234.5, "#,##0.00") == "1,234.50"
    assert format_value(1234.5, "#,##0.00", "de_DE") == "1.234,50"
    assert format_value(-0.175, "0.0%", "de") == "-17,5%"
    assert format_value(1234.5, "#,##0.00", "fr") == "1 234,50"


def test_locale_formatted_values_through_engine(engine):
    """with_locale('de') reaches formatted_values via the Result."""
    from mondrian_olap_spark.query import Query

    de = engine.with_locale("de_DE")
    r = (
        Query(de)
        .with_member("Pretty")
        .as_("sum_price", output="pretty", format_string=None)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].children")
        .execute()
    )
    # attach a format for the existing measure column
    r._formats["sum_price"] = "#,##0.00"
    for row in r.formatted_values:
        assert "," in row[0] and row[0].count(",") >= 1
        # de decimal comma: last separator is a comma with 2 digits after
        assert row[0][-3] == ","


def test_locale_keeps_literal_punctuation():
    """Locale swaps only numeric separators; literal pattern text keeps its
    punctuation (Java DecimalFormat localizes symbols, not literals)."""
    from mondrian_olap_spark.formats import format_value

    assert format_value(12.3, "0.00 kr.", "de") == "12,30 kr."


def test_date_minutes_context_rule():
    """VBA: an 'm' run adjacent to hours (after) or seconds (before) means
    MINUTES (review fix: hh:mm:ss rendered the month)."""
    import datetime

    from mondrian_olap_spark.formats import format_value

    t = datetime.datetime(2026, 8, 14, 9, 5, 7)
    assert format_value(t, "hh:mm:ss") == "09:05:07"
    assert format_value(t, "mm:ss") == "05:07"
    assert format_value(t, "dd.mm.yyyy") == "14.08.2026"  # month keeps mm


def test_decimal_values_format_numerically():
    """decimal.Decimal cells honor numeric format strings (review fix:
    they fell through to str())."""
    import decimal

    from mondrian_olap_spark.formats import format_value

    assert format_value(decimal.Decimal("1234.5"), "#,##0.00") == "1,234.50"
    assert format_value(decimal.Decimal("0.125"), "Percent") == "12.50%"
