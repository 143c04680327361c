from .kg_build import build_kg, build_kg_resumable, kg_tables, KGBuildResult

__all__ = ["build_kg", "build_kg_resumable", "kg_tables", "KGBuildResult"]
