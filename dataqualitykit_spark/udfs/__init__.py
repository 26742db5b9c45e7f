from .scoring import lang_ppl_udf
from .scrubbing import scrub_udf

__all__ = ["lang_ppl_udf", "scrub_udf"]
