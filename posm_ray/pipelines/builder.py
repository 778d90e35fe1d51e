"""Config-dataclass pipeline builder — the §2.11 user-extension surface.

The reference composes its pipelines from a task CLI plus YAML config
(``extractor/manage.py:108-247`` subcommands over ``settings.yaml.tmpl``
paths/tuning and ``admin_mapping.yaml`` per-country levels). The rebuild's
equivalent is a frozen dataclass + one ``build(config)`` function: every
knob a task CLI would expose (task selection, input dir, scale, admin
mapping overrides, simplify tolerance, dedup flavor, curation quotas,
checkpointed output) is a typed field, and the returned object is the same
lazy ``ray.data.Dataset`` (or resumable-write metrics dict) the underlying
pipeline functions produce — so a config is exactly as composable as the
Python API, just declarative.

No function here calls ``ray.init()`` — sessions belong to the caller.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    """One run of one task. Mirrors the reference's settings surface:

    - ``task`` — the manage.py subcommand analogue:
        ``flagship``      pages -> extract -> PIP join -> tile rollup
        ``curation``      quality gate -> exact dedup -> host quota -> mix
        ``dedup``         near-duplicate pairs (``dedup_method`` selects
                          exact rows / minhash / simhash)
        ``boundary``      extract_and_simplify analogue: hierarchy ->
                          dissolve -> DP-simplify views
    - ``sf_dir`` — input directory (documents.parquet et al).
    - ``replicate`` — in-stream input replication (bench scale).
    - ``out_dir`` — when set (flagship only), write hive-partitioned
      checkpointed output with per-partition lineage manifests and return
      the metrics dict instead of a Dataset (K2/resume semantics).
    - ``admin_mapping_default`` / ``admin_mapping_overrides`` — the
      admin_mapping.yaml analogue consumed by the boundary hierarchy
      (per-country admin-level predicate, M6).
    - ``simplify_tolerance`` — Douglas-Peucker tolerance
      (manage.py:116-121 default 0.001).
    - ``dedup_method`` — dedup task selection.
    - ``host_k`` / ``lang_n`` — curation per-host quota and per-language
      stratified mix size.
    """

    sf_dir: str
    task: str = "flagship"
    replicate: int = 1
    cell_col: str = "cell_r7"
    out_dir: str | None = None
    admin_mapping_default: dict | None = None
    admin_mapping_overrides: dict | None = None
    simplify_tolerance: float = 0.001
    dedup_method: str = "exact"  # exact | minhash | simhash
    host_k: int | None = None
    lang_n: int | None = None
    extra: dict = field(default_factory=dict)  # forward-compat passthrough


def build(config: PipelineConfig):
    """Compose and return the configured pipeline (lazy Dataset, or the
    resumable-write metrics dict for a checkpointed flagship run)."""
    if config.task == "flagship":
        from . import flagship

        if config.out_dir:
            return flagship.tiles_resumable(
                config.sf_dir, config.out_dir, replicate=config.replicate,
                cell_col=config.cell_col)
        return flagship.tiles(config.sf_dir, replicate=config.replicate,
                              cell_col=config.cell_col)

    if config.task == "curation":
        from . import textops

        kw = {}
        if config.host_k is not None:
            kw["host_k"] = config.host_k
        if config.lang_n is not None:
            kw["lang_n"] = config.lang_n
        return textops.curation_pipeline(config.sf_dir, **kw)

    if config.task == "dedup":
        from . import textops

        if config.dedup_method == "exact":
            return textops.dedup_exact_surviving(config.sf_dir)
        if config.dedup_method == "minhash":
            # the Dataset-returning pipeline (minhash_near_dups collects a
            # sorted DataFrame for the oracle contract; build() promises a
            # lazy Dataset for every method)
            return textops.minhash_verified_pairs(config.sf_dir)
        if config.dedup_method == "simhash":
            return textops.simhash_near_dups(config.sf_dir)
        raise ValueError(f"unknown dedup_method: {config.dedup_method!r}")

    if config.task == "boundary":
        from . import boundary, dissolve
        from ..sources import boundaries as bsrc

        h = boundary.extract_hierarchy(
            bsrc.raw_boundaries(),
            mapping_default=config.admin_mapping_default,
            mapping_overrides=config.admin_mapping_overrides)
        all_geom = dissolve.deconstruct_geometry(h.levels)
        return dissolve.simplify_table(all_geom,
                                       tolerance=config.simplify_tolerance)

    raise ValueError(f"unknown task: {config.task!r}")
