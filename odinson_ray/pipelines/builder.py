"""Composable pipeline builder (SURVEY §2.10): the flagship chain
``read -> annotate -> match(grammar) -> link -> canonicalize -> triples
-> write`` with every stage injectable.

    from odinson_ray.pipelines.builder import Pipeline

    ds = (Pipeline(sf_dir)
          .rules(MY_GRAMMAR)                 # YAML grammar (vars optional)
          .match(concurrency=8)              # actor-pool sizing
          .transform(my_batch_fn)            # arbitrary extra stage(s)
          .canonicalize(edges=my_edges)      # optional equivalence edges
          .link(alias_table)                 # optional alias table
          .triples()                         # aggregate to (s,p,o) counts
          .build())                          # -> ray.data.Dataset
    # or: .write(out_dir) to end in a pred-partitioned parquet sink

Stages not configured fall back to the flagship defaults; ``annotator``
switches between the inline deterministic path (None, fastest — nothing
nested crosses the object store) and a two-stage heavy-model actor pool
(a callable class, loaded once per actor)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from .kg import FLAGSHIP_RULES


class Pipeline:
    def __init__(self, sf_dir: str):
        self._sf_dir = sf_dir
        self._rules = FLAGSHIP_RULES
        self._variables: Optional[Dict[str, str]] = None
        self._annotator = None
        self._annotator_pool = 2
        self._concurrency = 4
        self._batch_size = 256
        self._transforms: List[Callable] = []
        self._canonicalize = True
        self._canon_edges = ()
        self._alias_table = None
        self._aggregate = True
        self._event_label = "SVO"

    # ------------------------------------------------------------ stages

    def rules(self, rules_yaml: str, variables: Optional[Dict[str, str]] = None):
        self._rules = rules_yaml
        self._variables = variables
        return self

    def annotator(self, annotator_cls, pool: int = 2):
        """Two-stage topology: a heavy annotator actor pool feeding the
        matcher through the object store (for model-backed annotation).
        Default (never called): annotation runs inline in the matcher."""
        self._annotator = annotator_cls
        self._annotator_pool = pool
        return self

    def match(self, concurrency: int = 4, batch_size: int = 256):
        self._concurrency = concurrency
        self._batch_size = batch_size
        return self

    def transform(self, fn: Callable):
        """Insert an arbitrary pyarrow-batch stage after the matcher."""
        self._transforms.append(fn)
        return self

    def events(self, label: str):
        self._event_label = label
        return self

    def canonicalize(self, on: bool = True, edges=()):
        self._canonicalize = on
        self._canon_edges = edges
        return self

    def link(self, alias_table=None):
        self._alias_table = alias_table
        return self

    def triples(self, aggregate: bool = True):
        self._aggregate = aggregate
        return self

    # ------------------------------------------------------------ execution

    def mentions(self):
        """Build up to the mention stream (no KG tail)."""
        from ..stages.annotate import annotate_stage
        from ..stages.match import GrammarMatcher, clamp_pool
        from .kg import mentions_dataset

        if self._annotator is None:
            ds = mentions_dataset(self._sf_dir, self._rules,
                                  concurrency=self._concurrency,
                                  batch_size=self._batch_size)
        else:
            from ..sources.interleaved import read_interleaved

            # TWO actor pools share the cluster here: their combined size
            # must leave >= 1 CPU for the read/consume task stages or the
            # streaming executor deadlocks (clamp_pool covers one pool;
            # this covers the pair). Shrink-and-warn beats hanging.
            pool_a, pool_m = self._annotator_pool, self._concurrency
            try:
                import ray

                cpus = (int(ray.cluster_resources().get("CPU", 0))
                        if ray.is_initialized() else 0)
            except Exception:
                cpus = 0
            if cpus and cpus < 3:
                # two pools + >=1 free CPU need at least 3 CPUs; flooring
                # both pools at 1 would still occupy every CPU and the
                # deadlock this guard exists for could occur (ADVICE r03)
                raise ValueError(
                    f"two-stage annotator topology needs >= 3 CPUs "
                    f"(have {cpus}): 1 per pool plus >= 1 free for task "
                    "stages; drop .annotator(...) to run annotation "
                    "inline in the matcher pool"
                )
            if cpus and pool_a + pool_m >= cpus:
                import warnings

                pool_a = max(1, min(pool_a, cpus - 2))
                pool_m = max(1, cpus - 1 - pool_a)
                assert pool_a + pool_m <= cpus - 1
                warnings.warn(
                    f"annotator+matcher pools resized to {pool_a}+{pool_m} "
                    f"to keep >=1 of {cpus} CPUs free for task stages "
                    "(streaming-executor deadlock otherwise)",
                    RuntimeWarning,
                )
            docs = read_interleaved(self._sf_dir)
            annotated = annotate_stage(docs, self._annotator,
                                       concurrency=pool_a)
            ds = annotated.map_batches(
                GrammarMatcher,
                fn_constructor_args=(self._rules, self._variables),
                batch_format="pyarrow",
                concurrency=clamp_pool(pool_m),
                batch_size=self._batch_size,
                num_cpus=1,
            )
        for fn in self._transforms:
            ds = ds.map_batches(fn, batch_format="pyarrow")
        return ds

    def build(self):
        """Full chain -> Dataset of (canonical) triples."""
        import pyarrow.compute as pc
        import ray

        from ..stages.canon import canonicalize_dataset
        from ..stages.link import build_alias_table, make_linker
        from ..stages.triples import aggregate_triples, mentions_to_triples
        from .kg import triples_dataset

        if (self._annotator is None and not self._transforms
                and not self._canon_edges and self._alias_table is None
                and self._event_label == "SVO"):
            # default shape: reuse the fused fast path (identical output)
            return triples_dataset(self._sf_dir, self._rules,
                                   concurrency=self._concurrency,
                                   batch_size=self._batch_size,
                                   aggregate=self._aggregate,
                                   canonicalize=self._canonicalize)
        mentions = self.mentions()
        label = self._event_label
        events = mentions.map_batches(
            lambda t: t.filter(pc.equal(t["label"], label)),
            batch_format="pyarrow",
        )
        ds = events.map_batches(mentions_to_triples, batch_format="pyarrow")
        if self._canonicalize:
            ds, mapping = canonicalize_dataset(
                ds, columns=("subj", "obj"), extra_edges=self._canon_edges)
            alias = (self._alias_table if self._alias_table is not None
                     else build_alias_table(mapping.keys()))
            ds = ds.map_batches(make_linker(ray.put(alias), ("subj", "obj")),
                                batch_format="pyarrow")
        if self._aggregate:
            ds = aggregate_triples(ds)
        return ds

    def write(self, out_dir: str, partition_cols=("pred",)):
        ds = self.build()
        ds.write_parquet(out_dir, partition_cols=list(partition_cols))
        return ds
