"""VBA format-string interpreter for ``formatted_values``
(SURVEY.md §2.7; reference ``jar!mondrian/util/Format`` — measure
``format_string`` schema.rb:296-297, fixture formats
``test/fixtures/MondrianTest.xml:98-127``, behavior
``test/mondrian_test.rb:163-167``).

Covers the subset the reference exercises: named formats (Standard, Fixed,
Percent, Currency), digit patterns (``#,##0``, ``#,##0.00``, ``0.0%``,
``$#,##0.00``), multi-section ``pos;neg;zero`` strings, and VBA date tokens
(``dd.mm.yyyy``, ``hh:nn:ss``).  Formatting is a driver-side presentation
concern — cells shown to a human are small by definition — so this is plain
Python over collected values, never a UDF in the plan.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import re

#: language → (decimal separator, grouping separator); everything else
#: keeps the en defaults.  Mirrors Java DecimalFormatSymbols per Locale —
#: the reference formats through java.util.Locale (connection.rb:213-223).
_LOCALE_SEPARATORS = {
    "de": (",", "."),
    "es": (",", "."),
    "it": (",", "."),
    "pt": (",", "."),
    "nl": (",", "."),
    "fr": (",", "\u00a0"),
    "ru": (",", "\u00a0"),
}


def _separators(locale: str | None) -> tuple[str, str]:
    # accept both underscore (Java Locale) and hyphen (BCP-47) forms
    lang = re.split(r"[-_]", locale or "en")[0].lower()
    return _LOCALE_SEPARATORS.get(lang, (".", ","))


NAMED = {
    "standard": "#,##0.##",
    "fixed": "0.00",
    "percent": "0.00%",
    "currency": "$#,##0.00",
    "general number": "#.######",
}

_DATE_TOKENS = [
    ("yyyy", "%Y"),
    ("yy", "%y"),
    ("mmmm", "%B"),
    ("mmm", "%b"),
    ("mm", "%m"),
    ("m", "%-m"),
    ("dd", "%d"),
    ("d", "%-d"),
    ("hh", "%H"),
    ("h", "%-H"),
    ("nn", "%M"),
    ("n", "%-M"),
    ("ss", "%S"),
    ("s", "%-S"),
]


def format_value(value, fmt: str | None, locale: str | None = None) -> str:
    """Format one cell value with a VBA format string; numeric separators
    follow ``locale`` (de → 1.234,50) like java.util.Format under the
    connection's Locale."""
    if value is None:
        sections = (fmt or "").split(";")
        return sections[3] if len(sections) > 3 else ""
    if fmt is None or fmt == "":
        return str(value)
    if isinstance(value, (_dt.date, _dt.datetime)):
        return _format_date(value, fmt)
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, (int, float, _decimal.Decimal)):
        return _format_number(float(value), fmt, locale)
    return str(value)


_DATE_TOKEN_RE = re.compile(
    "|".join(re.escape(tok) for tok, _ in _DATE_TOKENS)
)
_DATE_TOKEN_MAP = dict(_DATE_TOKENS)


def _format_date(value, fmt: str) -> str:
    low = fmt.lower()
    # VBA context rule (mondrian.util.Format, Vba.format): an 'm' run
    # adjacent to an hour run (after) or a second run (before) means
    # MINUTES — rewrite those runs to the unambiguous 'n' token first so
    # 'hh:mm:ss' renders minutes, not the month
    low = re.sub(
        r"(h+)([:.\-/ ]?)(m+)",
        lambda m: m.group(1) + m.group(2) + "n" * len(m.group(3)),
        low,
    )
    low = re.sub(
        r"(m+)([:.\-/ ]?)(s+)",
        lambda m: "n" * len(m.group(1)) + m.group(2) + m.group(3),
        low,
    )
    # single-pass token substitution (sequential replace would corrupt
    # earlier expansions: the 'm' in '%m' is itself a VBA token)
    out = _DATE_TOKEN_RE.sub(lambda m: _DATE_TOKEN_MAP[m.group(0)], low)
    return value.strftime(out)


def _format_number(value: float, fmt: str, locale: str | None = None) -> str:
    pattern = NAMED.get(fmt.strip().lower(), fmt)
    sections = pattern.split(";")
    if value < 0 and len(sections) > 1:
        return _apply_pattern(-value, sections[1], locale)
    if value == 0 and len(sections) > 2:
        return _apply_pattern(value, sections[2], locale)
    out = _apply_pattern(abs(value), sections[0], locale)
    return "-" + out if value < 0 else out


_PAT_RE = re.compile(
    r"^(?P<prefix>[^#0]*?)(?P<int>[#,0]+)(?:\.(?P<frac>[#0]+))?(?P<suffix>.*)$"
)


def _apply_pattern(value: float, pattern: str, locale: str | None = None) -> str:
    # locale swaps only the NUMERIC separators the pattern emits — literal
    # prefix/suffix text keeps its punctuation (Java DecimalFormat under a
    # Locale localizes symbols, never pattern literals)
    dec_sep, grp_sep = _separators(locale)
    m = _PAT_RE.match(pattern)
    if not m:
        # no digit placeholders → the section is literal text (e.g. the
        # zero-section 'zero' in '0.00;(0.00);zero')
        return pattern if not re.search(r"[#0]", pattern) else str(value)
    prefix, int_pat, frac_pat, suffix = (
        m.group("prefix"),
        m.group("int"),
        m.group("frac") or "",
        m.group("suffix"),
    )
    if "%" in prefix or "%" in suffix:
        value = value * 100.0
    grouping = "," in int_pat
    min_int = int_pat.replace(",", "").count("0")
    max_frac = len(frac_pat)
    min_frac = frac_pat.count("0")

    if math.isnan(value):
        return prefix + "NaN" + suffix
    if math.isinf(value):
        # a finite value can overflow to inf via the % scaling
        return prefix + "Infinity" + suffix

    rounded = round(value, max_frac)
    int_part = int(rounded)
    frac_value = abs(rounded - int_part)

    int_str = str(int_part).zfill(min_int)
    if min_int == 0 and int_part == 0 and max_frac > 0:
        int_str = ""  # '#'-only integer part drops the leading zero
    if grouping and int_str:
        # group the zero-PADDED digit string (int() would strip the
        # '0'-placeholder padding: '0,000' on 5 must give '0,005')
        sign = "-" if int_str.startswith("-") else ""
        digits = int_str.lstrip("-")
        chunks = []
        while len(digits) > 3:
            chunks.append(digits[-3:])
            digits = digits[:-3]
        chunks.append(digits)
        int_str = sign + grp_sep.join(reversed(chunks))

    frac_digits = ""
    if max_frac:
        full = f"{frac_value:.{max_frac}f}"[2:]  # exactly max_frac digits
        keep = max(min_frac, len(full.rstrip("0")))
        frac_digits = full[:keep]

    out = int_str
    if frac_digits:
        out += dec_sep + frac_digits
    elif not out:
        out = "0"
    return prefix + out + suffix
