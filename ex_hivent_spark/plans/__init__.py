"""Plan registry package. ``load_all()`` imports every module that
registers queries; ``registry.all_specs()`` returns the full inventory.
"""

from __future__ import annotations

_LOADED = False


def load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    import ex_hivent_spark.operators.scans  # noqa: F401
    import ex_hivent_spark.operators.joins  # noqa: F401
    import ex_hivent_spark.operators.aggregates  # noqa: F401
    import ex_hivent_spark.operators.windows  # noqa: F401
    import ex_hivent_spark.operators.sets  # noqa: F401
    import ex_hivent_spark.operators.analytics  # noqa: F401
    import ex_hivent_spark.operators.tpch_full  # noqa: F401
    import ex_hivent_spark.operators.geo  # noqa: F401
    import ex_hivent_spark.operators.drift  # noqa: F401
    import ex_hivent_spark.operators.stats  # noqa: F401
    import ex_hivent_spark.operators.inference  # noqa: F401
    import ex_hivent_spark.operators.tsdiag  # noqa: F401
    import ex_hivent_spark.operators.tsfeat  # noqa: F401
    import ex_hivent_spark.operators.market  # noqa: F401
    import ex_hivent_spark.operators.finance  # noqa: F401
    import ex_hivent_spark.operators.risk  # noqa: F401
    import ex_hivent_spark.operators.resample  # noqa: F401
    import ex_hivent_spark.operators.nonparam  # noqa: F401
    import ex_hivent_spark.operators.assoc  # noqa: F401
    import ex_hivent_spark.operators.quality  # noqa: F401
    import ex_hivent_spark.operators.markov  # noqa: F401
    import ex_hivent_spark.operators.momentum  # noqa: F401
    import ex_hivent_spark.operators.volumeflow  # noqa: F401
    import ex_hivent_spark.operators.behavior  # noqa: F401
    import ex_hivent_spark.functions.scalar  # noqa: F401
    import ex_hivent_spark.functions.udfs  # noqa: F401
    import ex_hivent_spark.llm.decontam  # noqa: F401
    import ex_hivent_spark.llm.dedup  # noqa: F401
    import ex_hivent_spark.llm.text  # noqa: F401
    import ex_hivent_spark.llm.similarity  # noqa: F401
    import ex_hivent_spark.llm.multimodal  # noqa: F401
    import ex_hivent_spark.llm.pipeline  # noqa: F401
    import ex_hivent_spark.llm.clusters  # noqa: F401
    import ex_hivent_spark.llm.curation  # noqa: F401
    import ex_hivent_spark.llm.corpus  # noqa: F401
    import ex_hivent_spark.llm.ngrams  # noqa: F401
    import ex_hivent_spark.llm.clusterqc  # noqa: F401
    import ex_hivent_spark.llm.lexsignals  # noqa: F401
    import ex_hivent_spark.llm.embaudit  # noqa: F401
    import ex_hivent_spark.llm.docstats  # noqa: F401
    import ex_hivent_spark.llm.coverage  # noqa: F401
    import ex_hivent_spark.operators.convert  # noqa: F401
    import ex_hivent_spark.operators.funnelwin  # noqa: F401
    import ex_hivent_spark.operators.inequality  # noqa: F401
    import ex_hivent_spark.operators.maintjobs  # noqa: F401

    _LOADED = True
