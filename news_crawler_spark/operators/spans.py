"""Interleaved text+media span assembly — SURVEY.md §2.2 P4.

Every reference crawler emits its record fields in a fixed order
(record constructors, e.g. SkyDaily_Crawler.py:131-138); the engine's
canonical form is the ``spans`` column from BASELINE.json ``input_hint``:
``array<struct<kind:string,text:string,media_ref:string,offset:int>>``
with kind ∈ {title, summary, image}, offsets dense 0..n-1, text '' on
image spans and media_ref '' on text spans. Pure native expression —
no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _span(kind: str, text: Column, media_ref: Column, offset: Column) -> Column:
    return F.struct(
        F.lit(kind).alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


def build_spans(title: Column, summary: Column, img_canon: Column) -> Column:
    """title span always; summary span when summary != ''; image span when
    img_canon non-empty — offsets dense (reference_model.assemble_spans)."""
    has_sm = summary.isNotNull() & (summary != "")
    has_img = img_canon.isNotNull() & (img_canon != "")
    img_off = F.when(has_sm, F.lit(2)).otherwise(F.lit(1))
    # typed empty array<span>: slice of a dummy single-span array
    empty = F.slice(F.array(_span("title", F.lit(""), F.lit(""), F.lit(0))), 1, 0)
    return F.concat(
        F.array(_span("title", title, F.lit(""), F.lit(0))),
        F.when(has_sm, F.array(_span("summary", summary, F.lit(""), F.lit(1)))).otherwise(empty),
        F.when(has_img, F.array(_span("image", F.lit(""), img_canon, img_off))).otherwise(empty),
    )
