from .rules import RuleExtractor, EntityRec, TripleRec

__all__ = ["RuleExtractor", "EntityRec", "TripleRec"]
