"""Chinese text normalization parity vs the reference chn_text_norm package.

The reference package (text_utils/chn_text_norm) is pure Python and
importable in this sandbox, so parity is testable directly: fuzz thousands
of generated numeral/date/money/phone/percent/fraction strings through both
implementations and assert byte-exact equality (VERDICT round-1 item 6).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

try:
    from text_utils.chn_text_norm.text import Text as RefText
except Exception:  # pragma: no cover
    RefText = None

from streamvoiceanon_tpu.utils.cn_norm import normalize_cn_text

pytestmark = pytest.mark.skipif(RefText is None, reason="reference unavailable")


def ref_norm(s: str) -> str:
    return RefText(raw_text=s).normalize()


def check(s: str):
    assert normalize_cn_text(s) == ref_norm(s), repr(s)


def test_handpicked_cases():
    for s in [
        "我有123个苹果",
        "2024年1月5日",
        "09年3月15号",
        "12.5%",
        "电话010-12345678",
        "固话：0595-23865596或23880880。",
        "手机：+86 19859213959或15659451527。",
        "1/3的人",
        "分数：32477/76391。",
        "我花了100元",
        "金钱：12块5，34.5元，20.1万",
        "10203",
        "13800138000",
        "0.5",
        "第2名",
        "一共12000人",
        "3.14159",
        "25%",
        "他1998年出生",
        "编号：31520181154418。",
        "纯数：2983.07克或12345.60米。",
        "特殊：O2O或B2C。",
        "涨了12.5%",
        "1999年",
        "5元",
        "电话13800138000",
        "占1/3左右",
        "3/4拍",
        "80.03%",
        "这个价格是200000000元",
        "2两酒与3两肉",
        "105人",
        "10万",
        "",
        "无数字文本",
    ]:
        check(s)


def test_fuzz_cardinals_and_decimals():
    rng = np.random.default_rng(0)
    for _ in range(400):
        n = int(10 ** rng.uniform(0, 12))
        check(f"共{n}人参加")
        check(str(n))
    for _ in range(200):
        a = int(10 ** rng.uniform(0, 6))
        b = rng.integers(0, 10**6)
        check(f"长度为{a}.{b:06d}米")


def test_fuzz_dates_money_percent_phone_fraction():
    rng = np.random.default_rng(1)
    for _ in range(250):
        y = rng.integers(1900, 2100) if rng.random() < 0.7 else rng.integers(0, 100)
        m = rng.integers(1, 13)
        d = rng.integers(1, 32)
        suffix = "日" if rng.random() < 0.5 else "号"
        check(f"他在{y:02d}年{m}月{d}{suffix}出生")
        check(f"{m}月{d}{suffix}见")
    for _ in range(250):
        amt = round(float(10 ** rng.uniform(0, 5)), int(rng.integers(0, 3)))
        unit = ["元", "块", "万元", "亿", "角", "分"][rng.integers(0, 6)]
        check(f"价格{amt:g}{unit}左右")
    for _ in range(150):
        p = round(float(rng.uniform(0, 100)), int(rng.integers(0, 3)))
        check(f"上涨了{p:g}%")
        check(f"上涨了{p:g}％")
    for _ in range(150):
        a, b = int(rng.integers(1, 10**4)), int(rng.integers(1, 10**4))
        check(f"大约{a}/{b}的比例")
    prefixes = ["139", "138", "150", "188", "177", "198"]
    for _ in range(100):
        mob = prefixes[rng.integers(0, len(prefixes))] + "".join(
            str(rng.integers(0, 10)) for _ in range(8)
        )
        plus = "+86 " if rng.random() < 0.3 else ""
        check(f"电话{plus}{mob}。")
    for _ in range(100):
        area = ["010", "021", "0595", "0755"][rng.integers(0, 4)]
        local = str(rng.integers(1, 10)) + "".join(
            str(rng.integers(0, 10)) for _ in range(int(rng.integers(6, 8)))
        )
        sep = "-" if rng.random() < 0.7 else ""
        check(f"固话{area}{sep}{local}，请拨打")


def test_fuzz_mixed_sentences():
    rng = np.random.default_rng(2)
    frags = [
        "今天", "大概", "合计", "其中", "报告说", "注意", "O2O模式", "第",
        "价格为", "电话是", "占比", "编号",
    ]
    for _ in range(300):
        parts = []
        for _ in range(int(rng.integers(1, 5))):
            parts.append(frags[rng.integers(0, len(frags))])
            kind = rng.integers(0, 6)
            if kind == 0:
                parts.append(str(int(10 ** rng.uniform(0, 9))))
            elif kind == 1:
                parts.append(f"{rng.uniform(0, 1000):.2f}%")
            elif kind == 2:
                parts.append(f"{int(rng.integers(1, 100))}个")
            elif kind == 3:
                parts.append(f"{int(rng.integers(1900, 2100))}年")
            elif kind == 4:
                parts.append(f"{int(rng.integers(1, 10**4))}元")
            else:
                parts.append(f"{int(rng.integers(1, 100))}/{int(rng.integers(1, 100))}")
        check("，".join(parts) + "。")
