"""Example user transformer: corpus curation as a pipeline step.

Shows how the training-data operators compose inside the reference-style
Transformer contract (validate/run/post_process receiving a scoped
metastore reader): quality gates -> Gopher repetition gates -> optional
learned-classifier gate -> PII redaction -> exact dedup survivor join. Referenced by
``corpus_curation.conf``; load it by putting this directory on PYTHONPATH
and setting ``class = "curation_transformer.CurationTransformer"``.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pramen_spark.api import Reason, Transformer
from pramen_spark.operators.dedup import exact_dedup
from pramen_spark.operators.text import (
    gopher_quality_filter,
    quality_classifier_score,
    quality_score,
    redact_pii,
    repetition_stats,
)


class CurationTransformer(Transformer):
    """Options: ``input.table`` (required), ``min.quality`` (default 0.3),
    ``max.dup.word.frac`` (default 0.5); ``apply.gopher.rules`` = "true"
    adds the Gopher/C4 document rule gate, with thresholds overridable via
    ``gopher.min.words`` and ``gopher.min.stopwords`` (corpora differ —
    code or non-English corpora typically relax the stopword floor);
    ``apply.classifier`` = "true" adds the learned-classifier gate
    (hashed-n-gram linear scorer), with ``classifier.threshold`` and
    ``classifier.bias`` overridable."""

    def validate(self, metastore, info_date, options) -> Reason:
        if "input.table" not in options:
            return Reason.not_ready("Option 'input.table' is not defined")
        return Reason.ready()

    def run(self, metastore, info_date, options) -> DataFrame:
        docs = metastore.get_table(options["input.table"])
        min_quality = float(options.get("min.quality", 0.3))
        max_dup = float(options.get("max.dup.word.frac", 0.5))

        quality = quality_score(docs).select("doc_id", "quality_score")
        repetition = repetition_stats(docs).select("doc_id", "dup_word_frac")
        gated = (
            docs.join(quality, "doc_id")
            .join(repetition, "doc_id")
            .filter(
                (F.col("quality_score") >= min_quality)
                & (F.col("dup_word_frac") <= max_dup)
            )
        )
        if options.get("apply.gopher.rules", "false").lower() == "true":
            verdicts = gopher_quality_filter(
                docs,
                min_words=int(options.get("gopher.min.words", 50)),
                min_required_stopwords=int(
                    options.get("gopher.min.stopwords", 2)
                ),
            )
            gated = gated.join(
                verdicts.filter("keep").select("doc_id"), "doc_id", "left_semi"
            )
        if options.get("apply.classifier", "false").lower() == "true":
            scores = quality_classifier_score(
                docs,
                threshold=float(options.get("classifier.threshold", 0.5)),
                bias=float(options.get("classifier.bias", 0.0)),
            )
            gated = gated.join(
                scores.filter("keep").select("doc_id"), "doc_id", "left_semi"
            )
        survivors = exact_dedup(gated).select("doc_id")
        redacted = redact_pii(gated.select("doc_id", "text"))
        return (
            gated.drop("text")
            .join(survivors, "doc_id", "left_semi")
            .join(redacted, "doc_id")
        )
