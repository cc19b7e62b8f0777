"""Simplified→Traditional Chinese conversion (OpenCC ``s2twp`` semantics).

The reference converts triple/entity/text cells with OpenCC ``s2twp`` before
dedup keys are computed (reference ``CommonCrawl/data/train/postprecess.py:64-71,
130-135`` and ``sota_ner/ckip_expansion.py:25-35``), so Simplified/Traditional
variants of the same triple collapse. The real ``opencc`` package is not in
this container; we use it when importable and otherwise fall back to a
deterministic built-in character map covering the closed character set of the
synthetic corpus plus the most common simplified forms. Both the Spark
pipeline and the plain-Python parity oracle call THIS function, so parity is
exact regardless of which backend is active.
"""

from __future__ import annotations

from functools import lru_cache

try:  # pragma: no cover - optional dependency
    from opencc import OpenCC  # type: ignore

    _CONVERTER = OpenCC("s2twp")

    def _convert(text: str) -> str:
        return _CONVERTER.convert(text)

except ImportError:  # deterministic built-in fallback
    _CONVERTER = None

    # Simplified → Traditional (Taiwan) single-character map. Closed over the
    # synthetic-corpus vocabulary + frequent simplified characters.
    _S2T = {
        "陈": "陳", "刘": "劉", "张": "張", "杨": "楊", "黄": "黃", "赵": "趙",
        "吴": "吳", "孙": "孫", "马": "馬", "罗": "羅", "郑": "鄭", "许": "許",
        "叶": "葉", "吕": "呂", "苏": "蘇", "卢": "盧", "贾": "賈", "钱": "錢",
        "龙": "龍", "万": "萬", "温": "溫", "谢": "謝", "邓": "鄧", "韩": "韓",
        "冯": "馮", "于": "於", "蒋": "蔣", "沈": "瀋", "师": "師", "学": "學",
        "生": "生", "关": "關", "系": "係", "亲": "親", "属": "屬", "无": "無",
        "长": "長", "妇": "婦", "儿": "兒", "女": "女", "妈": "媽", "爸": "爸",
        "与": "與", "东": "東", "车": "車", "进": "進", "华": "華", "国": "國",
        "伟": "偉", "军": "軍", "义": "義", "乐": "樂", "书": "書", "云": "雲",
        "凤": "鳳", "刚": "剛", "丽": "麗", "红": "紅", "绍": "紹", "维": "維",
        "继": "繼", "贤": "賢", "荣": "榮", "静": "靜", "敏": "敏", "岚": "嵐",
        "宁": "寧", "汉": "漢", "济": "濟", "涛": "濤", "润": "潤", "泽": "澤",
        "这": "這", "们": "們", "为": "為", "来": "來", "对": "對", "会": "會",
        "语": "語", "说": "說", "时": "時", "间": "間", "两": "兩", "从": "從",
        "导": "導", "论": "論", "课": "課", "教": "教", "授": "授", "发": "發",
        "历": "歷", "业": "業", "毕": "畢", "结": "結", "婚": "婚", "养": "養",
        "谊": "誼", "谁": "誰", "调": "調", "研": "研", "究": "究", "实": "實",
        "验": "驗", "机": "機", "构": "構", "报": "報", "纸": "紙", "专": "專",
        "门": "門", "问": "問", "题": "題", "领": "領", "队": "隊", "员": "員",
        "兴": "興", "贵": "貴", "贺": "賀", "晓": "曉", "佩": "佩", "鹏": "鵬",
        "飞": "飛", "岁": "歲", "过": "過", "还": "還", "后": "後", "档": "檔",
        "击": "擊", "办": "辦", "号": "號", "电": "電", "视": "視", "台": "臺",
        "网": "網", "页": "頁", "记": "記", "者": "者", "采": "採", "访": "訪",
    }

    def _convert(text: str) -> str:
        return "".join(_S2T.get(ch, ch) for ch in text)


@lru_cache(maxsize=65536)
def s2t(text: str) -> str:
    """Convert one string Simplified→Traditional (memoized — the reference
    converts the same names repeatedly; the cache mirrors its converter reuse)."""
    if text is None:
        return None
    return _convert(text)


def s2t_list(items: list[str]) -> list[str]:
    """Convert + strip each element (reference ``train/postprecess.py:64-71``:
    ``[converter.convert(item.strip()) for item in string_list]``)."""
    return [s2t(str(item).strip()) for item in items]
