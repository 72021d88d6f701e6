"""Normalization parity — ports /root/reference/tests/test_preprocessing.py:11-77."""

from __future__ import annotations

import pytest

from islamic_ner_spark.functions import normalize as N


def test_remove_tashkeel() -> None:
    assert N.remove_tashkeel("مُحَمَّد") == "محمد"


def test_fold_letters_alif_variants() -> None:
    assert N.fold_letters("أبو") == "ابو"
    assert N.fold_letters("إسلام") == "اسلام"
    assert N.fold_letters("آية") == "ايه"  # alif madda + taa marbuta
    assert N.normalize("آية") == "ايه"


def test_fold_letters_taa_marbuta() -> None:
    assert N.fold_letters("مكة") == "مكه"


def test_fold_letters_alif_maqsura() -> None:
    assert N.fold_letters("موسى") == "موسي"


def test_fold_letters_tatweel() -> None:
    assert N.fold_letters("مـحـمـد") == "محمد"


def test_collapse_whitespace() -> None:
    assert N.collapse_whitespace("  هذا\tنص\n\nعربي  ") == "هذا نص عربي"


def test_strip_html() -> None:
    text = "<p>السلام&nbsp;عليكم</p><br><b>ورحمة الله</b>"
    stripped = N.strip_html(text)
    assert "<" not in stripped and ">" not in stripped
    assert "\xa0" in stripped
    assert "السلام" in stripped
    assert "ورحمة الله" in stripped


def test_full_pipeline_hadith_text() -> None:
    dirty = " <div>قَالَ&nbsp;رَسُولُ&nbsp;اللَّهِ: إِنَّمَا الأَعْمَالُ بِالنِّيَّاتِ.</div> "
    assert N.normalize(dirty) == "قال رسول الله: انما الاعمال بالنيات."


def test_non_arabic_pass_through() -> None:
    assert N.normalize("Hello, world! 123") == "Hello, world! 123"


def test_empty_string() -> None:
    assert N.normalize("") == ""


@pytest.mark.parametrize(
    "text",
    [
        "مُحَمَّد",
        "آية الكرسي",
        "  هذا\tنص\n\nعربي  ",
        "موسى وعيسى ومكة",
        "Hello, world! 123",
        "",
    ],
)
def test_column_expression_matches_python(spark, text: str) -> None:
    """normalize_col (JVM) == normalize (Python) on entity-free inputs."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(N.normalize_col(F.col("text")).alias("n")).collect()[0]["n"]
    assert got == N.normalize(text)
