"""Text utilities for training-data preparation.

Covers the reference text_utils package (SURVEY.md §2.2): transcript
cleaning + repetition filtering (text_utils/clean.py:25-48) and a compact
Chinese text normalization pass (numbers/dates/percent/money/phone — the
capabilities of text_utils/chn_text_norm/, re-expressed)."""

from __future__ import annotations

import re
from collections import Counter

_SYMBOL_MAP = {"‘": "'", "’": "'"}
_SYMBOL_RE = re.compile("|".join(re.escape(k) for k in _SYMBOL_MAP))
_EMOJI_RE = re.compile(
    "["
    "\U0001F600-\U0001F64F"
    "\U0001F300-\U0001F5FF"
    "\U0001F680-\U0001F6FF"
    "\U0001F1E0-\U0001F1FF"
    "]+",
    flags=re.UNICODE,
)


def clean_text(text: str) -> str:
    """Strip, map curly quotes, drop emojis, collapse repeated commas."""
    text = text.strip()
    text = _SYMBOL_RE.sub(lambda m: _SYMBOL_MAP[m.group()], text)
    text = _EMOJI_RE.sub("", text)
    text = re.sub(r"[,]{2,}", lambda m: m.group()[0], text)
    return text


def repetition_found(text: str, length: int = 2, tolerance: int = 10) -> bool:
    """True if any length-`length` pattern repeats more than `tolerance`
    times (loopy-ASR transcript filter)."""
    counts = Counter(text[i : i + length] for i in range(len(text) - length + 1))
    return any(c > tolerance for c in counts.values())


# ---------------------------------------------------------------------------
# Chinese text normalization (digits -> spoken form)
# ---------------------------------------------------------------------------

_CN_DIGITS = "零一二三四五六七八九"
_CN_UNITS = ["", "十", "百", "千"]
_CN_GROUPS = ["", "万", "亿", "万亿"]


def _cn_four(n: int) -> str:
    """0..9999 -> Chinese reading (no leading-zero collapse)."""
    if n == 0:
        return _CN_DIGITS[0]
    out = []
    zero_pending = False
    for i in range(3, -1, -1):
        d = (n // 10**i) % 10
        if d == 0:
            if out:
                zero_pending = True
            continue
        if zero_pending:
            out.append(_CN_DIGITS[0])
            zero_pending = False
        out.append(_CN_DIGITS[d] + _CN_UNITS[i])
    return "".join(out)


def number_to_chinese(n: int) -> str:
    """Integer -> Chinese cardinal (e.g. 10203 -> 一万零二百零三)."""
    if n < 0:
        return "负" + number_to_chinese(-n)
    if n == 0:
        return _CN_DIGITS[0]
    parts = []
    group = 0
    while n > 0:
        q = n % 10000
        if q:
            s = _cn_four(q) + _CN_GROUPS[group]
            if n // 10000 and q < 1000:
                s = _CN_DIGITS[0] + s
            parts.append(s)
        n //= 10000
        group += 1
    text = "".join(reversed(parts))
    # idiomatic 一十X -> 十X at the very front
    if text.startswith("一十"):
        text = text[1:]
    return text


def digits_to_chinese(s: str) -> str:
    """Digit-by-digit reading (telephone numbers; 1 -> 幺)."""
    return "".join("幺" if c == "1" else _CN_DIGITS[int(c)] for c in s if c.isdigit())


def normalize_chinese(text: str) -> str:
    """Normalize numeric patterns in Chinese text to spoken form:
    percentages, decimals, dates, phone-like digit runs, plain cardinals."""
    # percentages: 12.5% -> 百分之十二点五
    def pct(m):
        return "百分之" + _decimal(m.group(1))

    text = re.sub(r"(\d+(?:\.\d+)?)%", pct, text)

    # dates: 2024年1月5日
    text = re.sub(
        r"(\d{4})年",
        lambda m: digits_to_chinese(m.group(1)).replace("幺", "一") + "年",
        text,
    )
    text = re.sub(r"(\d{1,2})月", lambda m: number_to_chinese(int(m.group(1))) + "月", text)
    text = re.sub(r"(\d{1,2})日", lambda m: number_to_chinese(int(m.group(1))) + "日", text)

    # money: ¥12 or 12元
    text = re.sub(r"(\d+(?:\.\d+)?)元", lambda m: _decimal(m.group(1)) + "元", text)

    # fractions: 1/3 -> 三分之一 (chn_text_norm/fraction.py semantics)
    text = re.sub(
        r"(\d+)/(\d+)",
        lambda m: number_to_chinese(int(m.group(2)))
        + "分之"
        + number_to_chinese(int(m.group(1))),
        text,
    )

    # telephone with separators: 010-12345678 -> digit-by-digit both parts
    text = re.sub(
        r"\d{3,4}-\d{6,8}",
        lambda m: digits_to_chinese(m.group().replace("-", "")),
        text,
    )

    # long digit runs (>= 7 digits): read digit-by-digit (telephone)
    text = re.sub(r"\d{7,}", lambda m: digits_to_chinese(m.group()), text)

    # remaining decimals / integers
    text = re.sub(r"\d+\.\d+", lambda m: _decimal(m.group()), text)
    text = re.sub(r"\d+", lambda m: number_to_chinese(int(m.group())), text)
    return text


def _decimal(s: str) -> str:
    if "." in s:
        a, b = s.split(".")
        return number_to_chinese(int(a)) + "点" + "".join(_CN_DIGITS[int(c)] for c in b)
    return number_to_chinese(int(s))
