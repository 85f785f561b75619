"""Corpus source/sink: parquet round-trip with the input_hint schema, Lance
import gating, column pruning, schema validation."""

import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray import synth
from linref_ray.io import (
    IMAGE_CORPUS_SCHEMA,
    read_image_corpus,
    validate_corpus_schema,
    write_image_corpus,
)


class TestImageCorpusIO:
    def test_parquet_round_trip(self, ray_session, tmp_path):
        tbl = synth.make_images(50)
        out = str(tmp_path / "corpus")
        write_image_corpus(rd.from_arrow(tbl), out)
        back = read_image_corpus(out)
        assert back.count() == 50
        assert set(f.name for f in IMAGE_CORPUS_SCHEMA) <= set(
            back.schema().names
        )

    def test_column_pruning(self, ray_session, tmp_path):
        tbl = synth.make_images(20)
        out = str(tmp_path / "corpus")
        write_image_corpus(rd.from_arrow(tbl), out)
        slim = read_image_corpus(out, columns=["image_id", "caption"])
        assert slim.schema().names == ["image_id", "caption"]

    def test_lance_gated(self, ray_session, tmp_path):
        with pytest.raises(ImportError, match="lance"):
            read_image_corpus(str(tmp_path / "corpus.lance"))

    def test_schema_validation(self, ray_session, tmp_path):
        bad = rd.from_arrow(pa.table({"image_id": pa.array(["a"])}))
        with pytest.raises(ValueError, match="missing required columns"):
            validate_corpus_schema(bad)
