from .kg_build import build_kg, build_kg_resumable, kg_tables, KGBuildResult
from .llm_e2e import build_kg_llm_e2e

__all__ = ["build_kg", "build_kg_resumable", "kg_tables", "KGBuildResult",
           "build_kg_llm_e2e"]
