"""kiezray: Ray-Data-native hubness-reduced kNN entity resolution engine.

From-scratch rebuild of the capabilities of dobraczka/kiez (v0.5.0,
/root/reference) on Ray Data: blocking -> hubness-reduced reranking ->
transitive clustering over tables of interleaved text+media documents,
plus large-scale training-data operators (dedup, ANN search, text
analysis, multimodal plumbing).
"""

from .hubness import (
    CSLS,
    DisSimLocal,
    HubnessReduction,
    LocalScaling,
    MutualProximity,
    NoHubnessReduction,
)
from .kiez import Kiez
from .rerank import HUBNESS_METHODS

__all__ = [
    "Kiez",
    "HUBNESS_METHODS",
    "HubnessReduction",
    "NoHubnessReduction",
    "CSLS",
    "LocalScaling",
    "MutualProximity",
    "DisSimLocal",
]
__version__ = "0.1.0"
