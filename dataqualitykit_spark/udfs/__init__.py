from .scoring import lang_ppl_udf, scoring_udf
from .scrubbing import scrub_udf

__all__ = ["lang_ppl_udf", "scoring_udf", "scrub_udf"]
