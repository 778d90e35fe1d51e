"""Config-dataclass pipeline builder (§2.11 user-extension surface): one
declarative config composes the same pipelines the Python API exposes —
the manage.py-subcommands-over-YAML analogue (extractor/manage.py:108-247,
settings.yaml.tmpl, admin_mapping.yaml)."""

import pytest

SF = "/root/testdata/sf0.001"


class TestBuilder:
    def test_flagship_config_runs(self, ray_session):
        from posm_ray.pipelines import builder, flagship

        cfg = builder.PipelineConfig(sf_dir=SF, task="flagship")
        got = builder.build(cfg).to_pandas().sort_values("cell") \
            .reset_index(drop=True)
        want = flagship.tiles(SF).to_pandas().sort_values("cell") \
            .reset_index(drop=True)
        assert len(got) > 0 and got.equals(want)

    def test_dedup_config_runs(self, ray_session):
        from posm_ray.pipelines import builder

        cfg = builder.PipelineConfig(sf_dir=SF, task="dedup",
                                     dedup_method="exact")
        out = builder.build(cfg).to_pandas()
        assert len(out) > 0 and "doc_id" in out.columns

    def test_boundary_and_curation_configs_run(self, ray_session):
        """The boundary task (extract_and_simplify analogue) and the
        curation task both compose and run from a config; the curation
        quota knob reaches host_quota (smaller k -> no more rows)."""
        from posm_ray.pipelines import builder

        b = builder.build(builder.PipelineConfig(
            sf_dir=SF, task="boundary")).to_pandas()
        assert len(b) > 0 and {"osm_id", "geom_wkb"} <= set(b.columns)

        wide = builder.build(builder.PipelineConfig(
            sf_dir=SF, task="curation", host_k=5)).to_pandas()
        tight = builder.build(builder.PipelineConfig(
            sf_dir=SF, task="curation", host_k=1)).to_pandas()
        assert len(wide) > 0 and len(tight) <= len(wide)

    def test_unknown_task_rejected(self):
        from posm_ray.pipelines import builder

        with pytest.raises(ValueError):
            builder.build(builder.PipelineConfig(sf_dir=SF, task="nope"))
