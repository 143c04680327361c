"""agraph_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of JasonDZS/agraph
(reference at /root/reference, studied for *what* it computes only) as a
streaming ``ray.data.Dataset`` pipeline over Parquet transcript tables:

    read_parquet(transcripts)                       # conv_id, turn_idx, role, text, tool, ts
      -> reassemble conversations                   # groupby(conv_id) + in-group sort(turn_idx)
      -> chunk                                      # flat emission via map_batches
      -> extract entities + (subj, pred, obj)       # map_batches over Arrow, actor pools
      -> exact dedup                                # partial per-batch merge + groupby(norm_name)
      -> minhash-LSH linking + label-propagation    # distributed union-find
      -> materialize nodes/edges/chunks Parquet     # + per-partition lineage manifests

Everything here is built on public Ray Data / PyArrow APIs.
"""

from .config import KGConfig

__version__ = "0.1.0"
__all__ = ["KGConfig"]
