"""F12 — the prompt/label schema (SURVEY §2.6 F12): the textual contract
every scorer honors.

These templates ARE the interface between the pipeline and any model-backed
scorer: the deterministic scorers in this package produce answers in exactly
the answer schema each prompt requests, and the parse kernel
(functions/parse.py) consumes exactly that schema. A production scorer
plugs a real model behind the same templates (north star: "behind the same
prompt/label schema").

Each constant cites its reference source. The few-shot exemplar embeds a
synthetic article built from this repo's own template rules rather than the
reference's real-world news excerpt (same schema, no third-party text).
"""

from __future__ import annotations

#: M1/M2 — relation detection, one document per call
#: (reference ``CommonCrawl/multi_thread_gemini_api.py:113-117``;
#: the GPT twin is ``CommonCrawl/azure_gpt.py:60-75``).
DETECT_PROMPT = """請幫我找出以下文章中是否包含兩位具有明確姓名的人之間常見的人際關係(例如:親屬、師生、同事、其他)，且兩位關係人皆必須有明確名字，只有稱謂的不算。
若無關係直接回答:無 即可。
若有請依格式回答:有 (人名,人名,關係),(人名,人名,關係)...列舉出所有關係，小括號中必須包含2個人名實體和1個關係。
文章如下:
    [Document_start] {document} [Document_end]"""

#: M3 — TAIDE API detection variant (reference ``CommonCrawl/taideAPI.py:41-46``;
#: document truncated to 2000 chars, max_tokens=20 → detection-only answers).
DETECT_PROMPT_TAIDE = """請幫我找出以下文章中是否包含兩位具有明確姓名的人之間常見的人際關係(例如:親屬、師生、同事、同學...)?且兩位關係人皆必須有明確名字，只有稱謂的不算。
若無關係直接回答:無 即可
若有請依格式回答:有 (人名,人名,關係),(人名,人名,關係)...列舉出所有關係
USER:文章如下:{document}ASSISTANT:"""

#: M4 — one-shot detection variant (reference
#: ``CommonCrawl/few_shot_gemini_api.py:110-144``): answer carries a
#: ``Relations:`` prefix and an ``Explanation:`` line; the exemplar below is
#: synthetic (template kin_wife over cast names) in place of the reference's
#: real news article.
FEWSHOT_EXEMPLAR_DOC = "陳大文與妻子林美玲一同出席了典禮。市場分析指出，近期物價持續上漲。"
FEWSHOT_EXEMPLAR_ANS = (
    "Relations:有 (陳大文,林美玲,妻子)\n"
    "Explanation:文章中提到陳大文與妻子林美玲一同出席，可見兩人為夫妻關係"
)
DETECT_PROMPT_FEWSHOT = f"""請幫我找出以下文章中是否包含兩位具有明確姓名的人之間常見的人際關係(例如:親屬、師生、同事、同學...)?且兩位關係人皆必須有明確名字，只有稱謂的不算。
若無關係直接回答:Relations:無 即可
若有請依以下格式回答:
    Relations:有 (人名,人名,關係),(人名,人名,關係)...列舉出所有關係
    Explanation:解釋原因
範例如下:
TEXT:{FEWSHOT_EXEMPLAR_DOC}
{FEWSHOT_EXEMPLAR_ANS}
文章如下:
TEXT:{{document}}"""

#: M5 — cross-verification of k triples, numbered 正確/錯誤 answers with the
#: 4 error rules A–D (reference ``CommonCrawl/data/train/postprecess.py:198-210``).
VERIFY_PROMPT = """我從以下文章中找出的{re_num}組人名和人際關係三元組(人名,人名,關係)，關係共分為4種類別[親屬、師生、同事、其他]。
文章如下:
    [Document_start] {document} [Document_end]
關係如下:
    {relation_text}
請問以上{re_num}個人名關係三元組，分別是正確或錯誤?
以下4種情形視為錯誤:
    A.關係錯誤，例如:(蔣中正,蔣經國,同事)，正確關係應為(蔣中正,蔣經國,親屬)。
    B.人名實體並非人的姓名，例如:(習近平,共產黨,同事)，因為"共產黨"並非人的姓名，其他如單位、公司、組織、隊伍...等名稱皆為錯誤。
    C.人名實體沒有明確人名或是綽號，只有稱謂，例如:(湯姆·克魯斯,妻子,親屬)，並沒有給出妻子姓名，其他如老公、妻子、父親、母親、哥哥、姐姐、學生、某某...等亦同。
    D.兩個人名相同，例如:(徐志摩,徐志摩,其他),兩個人名相同即視為錯誤。
請依格式回答:
    {ans_format}"""

#: M6 — taxonomy classification of one free-text relation word
#: (reference ``CommonCrawl/data/train/postprecess.py:292-300``).
TAXONOMY_PROMPT = """我想將以下的關係進行分類成[師生關係、同事關係、親屬關係、其他關係]4種類別
如果是師生關係:請回答 師生
如果是同事關係:請回答 同事
如果是親屬關係:請回答 親屬
如果是其他關係:請回答 其他
關係:
{relation}
請問是 師生、同事、親屬、其他 哪一個?"""

#: M9 — batched 5-way pair classification, all extra pairs of one document
#: in one call (reference ``sota_ner/ckip_expansion.py:13-21`` =
#: ``sota_ner/gemini_expansion.py:13-21``; name_pairs/ans_format assembled at
#: ``:100-108``).
PAIR_BATCH_PROMPT = """根據以下文章，找出每組人名實體對中的人名之間的關係。關係分為:親屬關係、師生關係、同事關係、其他關係、沒有關係，共5種。
人名實體對：
    {name_pairs}
文章如下:
    [Document_start] {document} [Document_end]
回答格式：
    {ans_format}
請根據以上格式回答
"""

#: M8 — LLM person-NER (reference ``sota_ner/gemini_expansion.py:23-26``).
NER_PROMPT = """請找出以下文章中所有的人名，並依格式回答:(人名1,人名2,人名3...)，若文章中沒有具體人名，則回答:無
文章如下:
    [Document_start] {document} [Document_end]
"""

#: M10 — per-pair 5-way RE inference of the fine-tuned path
#: (reference ``re_inference.py:29-31``; the mT5 training prompt twin is
#: ``t5_finetune_re.py:128-130`` with an ``<extra_id_0>`` slot).
RE_PAIR_PROMPT = """根據以下文章，找出{person1}與{person2}中之間的關係。關係分為:親屬關係、師生關係、同事關係、其他關係、沒有關係，共5種。
文章如下:
{document}"""

ALL_PROMPTS = {
    "detect": DETECT_PROMPT,
    "detect_taide": DETECT_PROMPT_TAIDE,
    "detect_fewshot": DETECT_PROMPT_FEWSHOT,
    "verify": VERIFY_PROMPT,
    "taxonomy": TAXONOMY_PROMPT,
    "pair_batch": PAIR_BATCH_PROMPT,
    "ner": NER_PROMPT,
    "re_pair": RE_PAIR_PROMPT,
}
