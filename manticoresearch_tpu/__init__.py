"""manticoresearch_tpu: a TPU-native full-text search engine.

From-scratch re-design of Manticore Search's capabilities for TPU hardware
(jax/XLA/pallas compute path, Python/C++ host runtime). See ARCHITECTURE.md.
"""
__version__ = "0.1.0"

from .schema import AttrDef, AttrType, Schema  # noqa: F401
