"""Scale-extension queries (dedup, similarity, text analysis, multimodal).

Registered incrementally; see operators/ for the implementations.
"""

from __future__ import annotations
