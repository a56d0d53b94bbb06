"""Deterministic synthetic corpus: pages + gold triples + alias dict.

Seed-42 generator for the ``input_hint`` page table
(url, warc_ts, html, text, lang) with planted DuIE-2.0-shaped gold
triples (FIXTURES.md §1-§4).  Text is assembled from a fixed template
bank that embeds entity aliases and predicate trigger phrases, so gold
triples are known by construction; the pages exercise the reference's
cleaning edge cases: '®'/'◆' (data_loader_v2.py:185-186), '\\xa0' via
``&nbsp;`` (train.py:275), digit runs and latin runs inside CJK
(data_loader_v2.py:64-92).

Hub entities (~2 per language) appear in a large fraction of pages to
exercise the salted-join/aggregation paths.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from deepie_spark.config.schema import SYNTH_SCHEMA, SpoSchema
from deepie_spark.functions.textnorm import extract_text_py

SEED = 42

EN_FIRST = [
    "Alice", "Brandon", "Carla", "Derek", "Elena", "Felix", "Grace",
    "Hector", "Irene", "Jonas", "Katya", "Leon", "Mira", "Nolan",
    "Opal", "Pavel", "Quinn", "Rosa", "Stefan", "Talia",
]
EN_LAST = [
    "Moreau", "Kessler", "Vance", "Okafor", "Lindqvist", "Barros",
    "Takeda", "Novak", "Reyes", "Duval", "Hargrove", "Ibsen",
    "Castellan", "Whitlock", "Amari", "Petrov", "Solano", "Ferris",
]
ZH_SURNAMES = list("赵钱孙李周吴郑王冯陈褚卫蒋沈韩杨")
ZH_GIVEN = list("伟芳娜敏静丽强磊军洋勇艳杰娟涛明超秀兰霞平刚")
ZH_ORG_PARTS = list("华星光远大天金泰恒安创科")
ZH_WORK_PARTS = list("山河岁月风云江湖春秋梦城夜雨")
EN_ORG_A = ["Apex", "Borealis", "Cinder", "Dorado", "Everline", "Fathom",
            "Gilded", "Harbor"]
EN_ORG_B = ["Dynamics", "Holdings", "Studios", "Collective", "Labs",
            "Pictures", "Records", "Group"]
EN_PLACE = ["Northland", "Westmere", "Suncrest", "Bluehaven", "Eastfall",
            "Greyport", "Mistvale", "Oakridge", "Silverton", "Karuna"]
ZH_PLACE_PARTS = list("东南西北中青白黑红黄")
ZH_PLACE_SUFFIX = list("京州城市县镇")


@dataclass
class Entity:
    canonical_id: int
    name: str
    entity_type: str
    lang: str
    aliases: list[str] = field(default_factory=list)


@dataclass
class World:
    entities: list[Entity]
    by_type_lang: dict  # (type, lang) -> list[Entity]
    hubs: dict  # lang -> list[Entity]
    alias_rows: list[dict]

    def pick(self, rng: random.Random, etype: str, lang: str,
             hub_prob: float = 0.0) -> Entity:
        if hub_prob and rng.random() < hub_prob:
            cands = [e for e in self.hubs[lang] if e.entity_type == etype]
            if cands:
                return rng.choice(cands)
        return rng.choice(self.by_type_lang[(etype, lang)])


def _mk_entities(rng: random.Random) -> list[Entity]:
    ents: list[Entity] = []
    cid = 0

    def add(name: str, etype: str, lang: str, extra_aliases=()):
        nonlocal cid
        ents.append(Entity(cid, name, etype, lang, [name, *extra_aliases]))
        cid += 1

    # English persons (some with a nested short alias = first name + initial)
    for i in range(24):
        fn, ln = EN_FIRST[i % len(EN_FIRST)], EN_LAST[(i * 7 + 3) % len(EN_LAST)]
        name = f"{fn} {ln}"
        extra = [f"{fn} {ln[0]}."] if i % 5 == 0 else []
        add(name, "Person", "en", extra)
    # Chinese persons
    for i in range(30):
        name = ZH_SURNAMES[i % len(ZH_SURNAMES)] + ZH_GIVEN[(i * 3) % len(ZH_GIVEN)] + (
            ZH_GIVEN[(i * 5 + 7) % len(ZH_GIVEN)] if i % 2 else "")
        add(name, "Person", "zh")
    # Companies (nested aliases: "Apex Dynamics" vs "Apex Dynamics Group")
    for i in range(10):
        base = f"{EN_ORG_A[i % len(EN_ORG_A)]} {EN_ORG_B[(i * 3 + 1) % len(EN_ORG_B)]}"
        extra = [base + " Group"] if i % 4 == 0 else []
        add(base, "Company", "en", extra)
    for i in range(12):
        base = "".join(ZH_ORG_PARTS[(i * j + j) % len(ZH_ORG_PARTS)] for j in (1, 2)) + "集团"
        add(base, "Company", "zh", [base[:-2]] if i % 3 == 0 else [])
    # Films / Songs / Works
    for i in range(12):
        add(f"The {EN_PLACE[i % len(EN_PLACE)]} Chronicle", "Film", "en")
    for i in range(14):
        add("《" + "".join(ZH_WORK_PARTS[(i + j) % len(ZH_WORK_PARTS)] for j in (0, 3)) + "》",
            "Film", "zh")
    for i in range(8):
        add(f"Song of {EN_PLACE[(i * 3) % len(EN_PLACE)]}", "Song", "en")
    for i in range(10):
        add("《" + ZH_WORK_PARTS[i % len(ZH_WORK_PARTS)] + "之歌》", "Song", "zh")
    for i in range(8):
        add(f"{EN_PLACE[(i * 7) % len(EN_PLACE)]} Nights", "Work", "en")
    for i in range(10):
        add("《" + "".join(ZH_WORK_PARTS[(i * 2 + j) % len(ZH_WORK_PARTS)] for j in (1, 4)) + "传》",
            "Work", "zh")
    # Geography
    for i, p in enumerate(EN_PLACE):
        add(p + " Republic", "Country", "en")
        add(p + " City", "City", "en")
        add(p, "Place", "en")
        add(p + " Basin", "Area", "en")
    for i in range(8):
        stem = ZH_PLACE_PARTS[i % len(ZH_PLACE_PARTS)] + ZH_PLACE_PARTS[(i * 3 + 1) % len(ZH_PLACE_PARTS)]
        add(stem + "国", "Country", "zh")
        add(stem + "市", "City", "zh")
        add(stem + ZH_PLACE_SUFFIX[i % len(ZH_PLACE_SUFFIX)], "Place", "zh")
        add(stem + "地区", "Area", "zh")
    # Awards (one shared alias across languages to exercise link ties)
    for i in range(6):
        add(f"Golden {EN_ORG_A[i % len(EN_ORG_A)]} Prize", "Award", "en")
    for i in range(6):
        add("金" + ZH_WORK_PARTS[i % len(ZH_WORK_PARTS)] + "奖", "Award", "zh")
    return ents


def gen_world(seed: int = SEED) -> World:
    rng = random.Random(seed)
    ents = _mk_entities(rng)
    by_type_lang: dict = {}
    for e in ents:
        by_type_lang.setdefault((e.entity_type, e.lang), []).append(e)
    hubs = {
        "en": [by_type_lang[("Person", "en")][0], by_type_lang[("Company", "en")][0],
               by_type_lang[("Film", "en")][0]],
        "zh": [by_type_lang[("Person", "zh")][0], by_type_lang[("Company", "zh")][0],
               by_type_lang[("Film", "zh")][0]],
    }
    alias_rows = []
    for e in ents:
        for a in e.aliases:
            alias_rows.append(
                {"alias": a, "canonical_id": e.canonical_id,
                 "entity_type": e.entity_type,
                 "weight": 5.0 if e in hubs.get(e.lang, []) else 1.0}
            )
    return World(ents, by_type_lang, hubs, alias_rows)


# --- sentence templates -----------------------------------------------------

NOISE_EN = [
    "The weather near {place} stayed calm for most of the week.",
    "Traffic around {place} slowed to a crawl during the festival.",
    "Several visitors praised the markets of {place}® recently.",
    "A small crowd gathered outside {place} before noon.",
]
NOISE_ZH = [
    "最近{place}附近的天气一直很平静。",
    "节日期间{place}周边道路十分拥堵◆。",
    "不少游客称赞了{place}的集市。",
]
NOISE_OTHER = [
    "Le marche pres de {place} etait tres anime ce matin.",
    "La ciudad de {place} celebro su feria anual.",
]


def _simple_sentence(rng, world: World, schema: SpoSchema, lang: str):
    simple_pids = [p.pid for p in schema.predicates
                   if p.pid not in schema.complex_primary_ids
                   and p.pid not in schema.complex_affiliate_ids]
    pid = rng.choice(simple_pids)
    pred = schema.by_id[pid]
    subj = world.pick(rng, pred.subject_type, lang, hub_prob=0.25)
    if pred.object_type in ("Date", "Number"):
        obj_surface = str(rng.randint(1900, 2025)) if pred.object_type == "Date" \
            else str(rng.randint(2, 999) * 1000)
    else:
        obj_surface = world.pick(rng, pred.object_type, lang).name
    trig = pred.triggers[lang]
    if lang == "zh":
        sent = f"{subj.name}{trig}{obj_surface}。"
    else:
        sent = f"{subj.name} {trig} {obj_surface}."
    gold = {
        "subject": subj.name,
        "subject_type": pred.subject_type,
        "predicate": pred.base,
        "object": {"@value": obj_surface},
        "object_type": {"@value": pred.object_type},
    }
    return sent, [gold]


def _complex_sentence(rng, world: World, schema: SpoSchema, lang: str):
    primary_pid = rng.choice(schema.complex_primary_ids)
    primary = schema.by_id[primary_pid]
    subj = world.pick(rng, primary.subject_type, lang, hub_prob=0.25)

    def value_for(pred):
        if pred.object_type == "Date":
            return str(rng.randint(1900, 2025))
        if pred.object_type == "Number":
            return str(rng.randint(2, 999) * 1000)
        return world.pick(rng, pred.object_type, lang).name

    obj_value = value_for(primary)
    affiliate_pids = schema.affiliates(primary_pid)
    n_aff = rng.randint(1, len(affiliate_pids))
    chosen = affiliate_pids[:n_aff]  # deterministic prefix keeps templates readable

    parts = []
    obj_map = {"@value": obj_value}
    obj_type_map = {"@value": primary.object_type}
    if lang == "zh":
        parts.append(f"{subj.name}{primary.triggers['zh']}{obj_value}")
        for apid in chosen:
            ap = schema.by_id[apid]
            av = value_for(ap)
            parts.append(f"{ap.triggers['zh']}{av}")
            obj_map[ap.slot] = av
            obj_type_map[ap.slot] = ap.object_type
        sent = "，".join(parts) + "。"
    else:
        parts.append(f"{subj.name} {primary.triggers['en']} {obj_value}")
        for apid in chosen:
            ap = schema.by_id[apid]
            av = value_for(ap)
            parts.append(f"{ap.triggers['en']} {av}")
            obj_map[ap.slot] = av
            obj_type_map[ap.slot] = ap.object_type
        sent = " ".join(parts) + "."
    gold = {
        "subject": subj.name,
        "subject_type": primary.subject_type,
        "predicate": primary.base,
        "object": obj_map,
        "object_type": obj_type_map,
    }
    return sent, [gold]


def _noise_sentence(rng, world: World, lang: str):
    bank = {"en": NOISE_EN, "zh": NOISE_ZH}.get(lang, NOISE_OTHER)
    place = world.pick(rng, "Place", lang if lang in ("en", "zh") else "en")
    return rng.choice(bank).format(place=place.name), []


def _page_html(i: int, sentences: list[str], rng: random.Random) -> bytes:
    body = []
    for s in sentences:
        esc = (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace("\xa0", "&nbsp;")
        )
        if rng.random() < 0.05:
            esc = f"<b>{esc}</b>"
        body.append(f"<p>{esc}</p>")
    html = (
        f"<html><head><title>t{i}</title>"
        f"<style>p {{margin: 0}}</style></head>"
        f"<body>{''.join(body)}<!-- crawl {i} --></body></html>"
    )
    return html.encode("utf-8")


def gen_corpus(
    n_pages: int,
    seed: int = SEED,
    world: World | None = None,
    schema: SpoSchema = SYNTH_SCHEMA,
    complex_frac: float = 0.15,
    noise_frac: float = 0.3,
):
    """Returns (pages_rows, gold_rows, world).

    pages_rows: url, warc_ts, html(bytes), text, lang — text is
    ``extract_text_py(html)`` by construction, which *defines* the
    byte-identity oracle for the extraction UDF.
    gold_rows: url, subject, subject_type, predicate, object(map),
    object_type(map).
    """
    world = world or gen_world(seed)
    rng = random.Random(seed * 1_000_003 + n_pages)
    t0 = datetime(2025, 1, 1)
    pages, gold = [], []
    for i in range(n_pages):
        r = rng.random()
        lang = "zh" if r < 0.8 else ("en" if r < 0.95 else "other")
        url = f"https://site{i % 97}.example/{hashlib.sha1(str(i).encode()).hexdigest()[:8]}"
        n_sent = rng.randint(1, 4)
        sentences, page_gold = [], []
        for _ in range(n_sent):
            if lang == "other" or rng.random() < noise_frac:
                s, g = _noise_sentence(rng, world, lang)
            elif rng.random() < complex_frac:
                s, g = _complex_sentence(rng, world, schema, lang)
            else:
                s, g = _simple_sentence(rng, world, schema, lang)
            sentences.append(s)
            page_gold.extend(g)
        html = _page_html(i, sentences, rng)
        text = extract_text_py(html)
        pages.append(
            {
                "url": url,
                "warc_ts": t0 + timedelta(seconds=i * 137),
                "html": html,
                "text": text,
                "lang": lang,
            }
        )
        for g in page_gold:
            gold.append({"url": url, **g})
    return pages, gold, world


def gen_attribute_corpus(n_records: int, seed: int = SEED, world: World | None = None):
    """Attribute-extraction fixture (FIXTURES.md §6): records with an
    entity span and planted attribute values; spans satisfy the
    reference's asserts ``text[start:end] == value``
    (attribute_extraction/data_loader.py:135, 155)."""
    from deepie_spark.operators.attributes import SYNTH_ATTRS

    world = world or gen_world(seed)
    rng = random.Random(seed * 7 + n_records)
    value_range = {
        "dose": (100, 999),
        "duration": (10000, 99999),
        "frequency": (10, 99),
        "onset": (1900, 2025),
    }
    persons = world.by_type_lang[("Person", "en")]
    out = []
    for rec_id in range(n_records):
        ent = rng.choice(persons).name
        n_attrs = rng.randint(1, len(SYNTH_ATTRS))
        chosen = SYNTH_ATTRS[:n_attrs]
        parts = [f"{ent} was treated"]
        attrs = []
        for a in chosen:
            lo, hi = value_range[a.name]
            val = str(rng.randint(lo, hi))
            parts.append(f"{a.trigger} {val}")
            attrs.append({"type": a.name, "value": val})
        text = " ".join(parts) + "."
        for a in attrs:
            start = text.index(a["value"])
            a["start"], a["end"] = start, start + len(a["value"])
            assert text[a["start"]:a["end"]] == a["value"]
        assert text[: len(ent)] == ent
        out.append(
            {
                "rec_id": rec_id,
                "text": text,
                "entity_name": ent,
                "entity_start": 0,
                "entity_end": len(ent),
                "attributes": attrs,
            }
        )
    return out


def corpus_dataframes(spark, n_pages: int, seed: int = SEED):
    """(pages_df, gold_df, alias_df) as Spark DataFrames."""
    from pyspark.sql import types as T

    pages, gold, world = gen_corpus(n_pages, seed)
    pages_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    gold_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("subject", T.StringType(), False),
            T.StructField("subject_type", T.StringType(), False),
            T.StructField("predicate", T.StringType(), False),
            T.StructField("object", T.MapType(T.StringType(), T.StringType()), False),
            T.StructField("object_type", T.MapType(T.StringType(), T.StringType()), False),
        ]
    )
    alias_schema = T.StructType(
        [
            T.StructField("alias", T.StringType(), False),
            T.StructField("canonical_id", T.LongType(), False),
            T.StructField("entity_type", T.StringType(), False),
            T.StructField("weight", T.DoubleType(), False),
        ]
    )
    pages_df = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in pages],
        schema=pages_schema,
    )
    gold_df = spark.createDataFrame(
        [
            (g["url"], g["subject"], g["subject_type"], g["predicate"],
             g["object"], g["object_type"])
            for g in gold
        ],
        schema=gold_schema,
    )
    alias_df = spark.createDataFrame(
        [(a["alias"], a["canonical_id"], a["entity_type"], a["weight"])
         for a in world.alias_rows],
        schema=alias_schema,
    )
    return pages_df, gold_df, alias_df
