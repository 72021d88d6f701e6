"""Differential fuzz parity against the reference implementation.

These tests import the reference's own modules (stdlib-only) read-only
from /root/reference and assert byte-identical behavior of our pure-Python
semantic core on thousands of randomized inputs.  They are the strongest
evidence for the P/R >= 0.95 triple gate: if the core is identical and the
Spark dataflow reproduces the core (test_pipeline_scale.py), the pipeline
reproduces the reference.

Skipped automatically when the reference checkout is absent.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "src").exists(), reason="reference checkout not available"
)

FIXTURE_GAZ = str(REFERENCE / "tests/fixtures/gazetteers")
RESOLVER_GAZ = str(REFERENCE / "tests/fixtures/resolver_gazetteers")

VOCAB = [
    "حدثنا", "اخبرنا", "عن", "قال", "رواه", "سمعت", "البخاري", "صحيح", "مالك",
    "عبد", "الله", "بن", "يوسف", "محمد", "اسماعيل", "الربا", "المدينة", "في",
    "كتاب", "باب", "حديث", "رقم", "123", "٤٥", "نهى", "ثم", "ان", "هذا",
    "أبو", "هريرة", "رضي", ".", "،", "مُحَمَّد", "مسند", "؟", "x1", "سنن",
]


@pytest.fixture(scope="module", autouse=True)
def _reference_on_path():
    sys.path.insert(0, str(REFERENCE))
    yield
    sys.path.remove(str(REFERENCE))


def test_normalize_parity() -> None:
    from src.preprocessing.normalize import ArabicNormalizer

    from islamic_ner_spark.functions.normalize import normalize

    ref = ArabicNormalizer()
    rng = random.Random(7)
    alphabet = list("ابتثجحخدذرزسشصضطظعغفقكلمنهويةىـأإآ ًٌٍَُِّْ\t\n<>&;pb") + [
        "&nbsp;", "&amp;", "<div>", "</div>",
    ]
    for _ in range(1500):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        assert ref.normalize(text) == normalize(text), repr(text)


def test_gazetteer_match_parity() -> None:
    from src.preprocessing.gazetteers import GazetteerMatcher

    from islamic_ner_spark.sources.gazetteer import Gazetteer

    ref = GazetteerMatcher(gazetteer_dir=FIXTURE_GAZ)
    mine = Gazetteer.from_dir(FIXTURE_GAZ)
    rng = random.Random(11)
    for _ in range(1500):
        text = rng.choice([" ", "  ", " ـ ", "، "]).join(
            rng.choice(VOCAB) for _ in range(rng.randint(0, 12))
        )
        expected = [
            (m["text"], m["start"], m["end"], m["entity_type"], m["canonical_name"])
            for m in ref.match(text)
        ]
        got = [
            (m.text, m.start, m.end, m.entity_type, m.canonical_name)
            for m in mine.match(text)
        ]
        assert expected == got, repr(text)


def test_annotator_parity() -> None:
    from src.ner.silver_annotator import SilverAnnotator

    from islamic_ner_spark.functions.annotate import annotate_raw, annotate_sanadset
    from islamic_ner_spark.sources.gazetteer import Gazetteer

    ref = SilverAnnotator(gazetteer_dir=FIXTURE_GAZ)
    mine = Gazetteer.from_dir(FIXTURE_GAZ)
    rng = random.Random(3)
    for _ in range(1200):
        text = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 16)))
        expected = ref.annotate_from_raw(text)
        tokens, labels = annotate_raw(text, mine)
        assert ([t for t, _ in expected], [l for _, l in expected]) == (tokens, labels), repr(text)

    tags = ["<SANAD>", "</SANAD>", "<MATN>", "</MATN>", "<NAR>", "</NAR>"]
    for _ in range(600):
        parts = []
        for _ in range(rng.randint(0, 8)):
            roll = rng.random()
            if roll < 0.3:
                inner = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 3)))
                parts.append(f"<NAR>{inner}</NAR>")
            elif roll < 0.4:
                parts.append(rng.choice(tags))
            else:
                parts.append(rng.choice(VOCAB))
        tagged = rng.choice([" ", ""]).join(parts)
        expected = ref.annotate_from_sanadset(tagged)
        tokens, labels = annotate_sanadset(tagged, mine)
        assert ([t for t, _ in expected], [l for _, l in expected]) == (tokens, labels), repr(tagged)


def test_relations_parity() -> None:
    from src.relations.extract import RelationExtractor

    from islamic_ner_spark.functions.relations import extract_relations

    ref = RelationExtractor()
    rng = random.Random(9)
    label_pool = [
        "O", "B-SCHOLAR", "I-SCHOLAR", "B-BOOK", "I-BOOK", "B-CONCEPT",
        "I-CONCEPT", "B-PLACE", "B-HADITH_REF", "I-HADITH_REF",
    ]

    def key(rel):
        s, t = rel["source"], rel["target"]
        return (
            rel["type"], s["type"], s["text"], s["start"], s["end"],
            t["type"], t["text"], t["start"], t["end"],
            rel["confidence"], rel["evidence"],
        )

    for i in range(2500):
        n = rng.randint(0, 14)
        tokens = [rng.choice(VOCAB) for _ in range(n)]
        labels = [rng.choice(label_pool) for _ in range(n)]
        metadata = rng.choice([None, {"hadith_id": f"h{i}"}, {}])
        expected = sorted(map(key, ref.extract(tokens, labels, metadata=metadata)))
        got = sorted(map(key, extract_relations(tokens, labels, metadata=metadata)))
        assert expected == got, (tokens, labels, metadata)


def test_resolver_parity() -> None:
    from src.graph.entity_resolver import EntityResolver

    from islamic_ner_spark.functions.resolve import resolve_mention
    from islamic_ner_spark.sources.gazetteer import Gazetteer

    mine = Gazetteer.from_dir(RESOLVER_GAZ)
    base = [
        "البخاري", "الإمام البخاري", "البخاريي", "شخص غير معروف", "مسلم",
        "مالك", "نافع", "عبد الله", "بدر", "الربا", "صحيح البخاري", "",
    ]
    rng = random.Random(13)
    cases = [(t, ty) for t in base for ty in ("SCHOLAR", "BOOK", "CONCEPT", "PLACE")]
    for _ in range(600):
        chars = list(rng.choice(base))
        for _ in range(rng.randint(0, 2)):
            if chars and rng.random() < 0.5:
                chars.pop(rng.randrange(len(chars)))
            else:
                chars.insert(rng.randrange(len(chars) + 1), rng.choice("ابتثجحيلمو "))
        cases.append(("".join(chars), rng.choice(("SCHOLAR", "BOOK", "CONCEPT", "PLACE"))))
    for text, entity_type in cases:
        # fresh reference resolver per case = stateless comparison
        expected = EntityResolver(gazetteer_dir=RESOLVER_GAZ).resolve(text, entity_type)
        assert expected == resolve_mention(text, entity_type, mine), (text, entity_type)
