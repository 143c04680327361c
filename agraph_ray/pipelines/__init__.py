from .kg_build import build_kg, build_kg_resumable, KGBuildResult

__all__ = ["build_kg", "build_kg_resumable", "KGBuildResult"]
