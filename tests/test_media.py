"""Video frame-sampling and audio feature stages: container round-trips,
stubbed real-codec gating, sampling layout, composition with the image
stages, and spectral-feature sanity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray import synth
from linref_ray.media import (
    decode_audio,
    decode_video,
    encode_audio,
    encode_video,
    extract_audio_features,
    sample_frames,
)


class TestContainers:
    def test_video_round_trip(self):
        px = np.arange(2 * 4 * 3 * 3, dtype=np.uint8).reshape(2, 4, 3, 3)
        back = decode_video(encode_video(px))
        np.testing.assert_array_equal(back, px)

    def test_audio_round_trip(self):
        s = (np.sin(np.linspace(0, 20, 500)) * 1000).astype(np.int16)
        back, sr = decode_audio(encode_audio(s, 8000))
        assert sr == 8000
        np.testing.assert_array_equal(back, s)

    def test_real_codecs_stubbed(self):
        with pytest.raises(NotImplementedError, match="pyav|ffmpeg"):
            decode_video(b"\x00\x00\x00\x18ftypmp42 not a fake container")
        with pytest.raises(NotImplementedError, match="soundfile"):
            decode_audio(b"ID3\x04 not a fake container either")
        with pytest.raises(NotImplementedError):
            encode_video(np.zeros((1, 2, 2, 3), np.uint8), vcodec="h264")


class TestSampleFrames:
    def test_uniform_sampling_layout(self, ray_session):
        vids = rd.from_arrow(synth.make_videos(6, frames=12, w=8, h=8))
        out = sample_frames(vids, k=4, concurrency=1).to_pandas()
        assert len(out) == 24  # 6 videos x 4 frames
        per = out.groupby("video_id").frame_idx.apply(sorted)
        for idxs in per:
            assert idxs == [0, 4, 7, 11]  # uniform over 12 frames
        # timestamps follow frame index / fps
        assert np.allclose(out.ts_sec, out.frame_idx / 30.0)

    def test_k_exceeds_frames(self, ray_session):
        vids = rd.from_arrow(synth.make_videos(2, frames=3, w=8, h=8))
        out = sample_frames(vids, k=10, concurrency=1).to_pandas()
        assert sorted(out[out.video_id == "vid-000000"].frame_idx) == [0, 1, 2]

    def test_composes_with_image_stages(self, ray_session):
        # Sampled frames are valid IMAGE-container rows: resize and
        # feature-extract run unchanged downstream.
        from linref_ray.images import extract_features, resize_images

        vids = rd.from_arrow(synth.make_videos(3, frames=6, w=16, h=16))
        frames = sample_frames(vids, k=2, concurrency=1)
        small = resize_images(frames, 8, 8).to_pandas()
        assert (small.w == 8).all() and len(small) == 6
        feats = extract_features(frames).to_pandas()
        assert "bytes" not in feats.columns
        assert feats.mean_r.between(0, 255).all()


class TestAudioFeatures:
    def test_spectral_ordering_and_payload_dropped(self, ray_session):
        auds = rd.from_arrow(synth.make_audio(5, seconds=0.5, sample_rate=8000))
        out = (
            extract_audio_features(auds, concurrency=1)
            .to_pandas()
            .sort_values("audio_id")
            .reset_index(drop=True)
        )
        assert "bytes" not in out.columns
        # pure tones at 100+50i Hz: centroid tracks the tone (spectral
        # leakage + the noise floor blur exact ordering between neighbors,
        # so assert the coarse relationship and per-clip proximity)
        assert out.spectral_centroid.iloc[-1] > out.spectral_centroid.iloc[0]
        assert (np.abs(out.spectral_centroid - out.tone_hz) < 200).all()
        assert (out.rms > 0.2).all() and (out.rms < 0.5).all()
        assert (out.zcr > 0).all()


class TestVideoNearDup:
    def test_planted_copies_and_majority_signature(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from linref_ray import synth
        from linref_ray.media import video_near_duplicates

        base = synth.make_videos(20, frames=8)
        sel = base.take([5, 5])
        ids = ["vid-000005#c1", "vid-000005#c2"]
        sel = sel.set_column(
            sel.schema.get_field_index("video_id"), "video_id",
            pa.array(ids),
        )
        out = (
            video_near_duplicates(
                rd.from_arrow(pa.concat_tables([base, sel])), max_hamming=6
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
        )
        assert len(out) == 3  # C(3,2) within the one family
        assert (out.hamming == 0).all()
        assert set(out.id_a).issubset({"vid-000005", "vid-000005#c1"})

    def test_method_validation(self, ray_session):
        import pytest as _pytest

        from linref_ray.media import VideoSignatures

        with _pytest.raises(ValueError):
            VideoSignatures(method="dhash")


class TestAudioNearDup:
    def test_planted_copies_and_volume_invariance(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from linref_ray import synth
        from linref_ray.media import (
            audio_near_duplicates,
            decode_audio,
            encode_audio,
        )

        base = synth.make_audio(20)
        s, sr = decode_audio(base["bytes"][4].as_py())
        half = encode_audio(
            (s.astype(np.float64) * 0.5).astype(np.int16), sr
        )
        extra = pa.table(
            {
                "audio_id": pa.array(
                    [base["audio_id"][4].as_py() + "#half"]
                ),
                "bytes": pa.array([half], pa.binary()),
                **{
                    c: base[c][4:5]
                    for c in base.column_names
                    if c not in ("audio_id", "bytes")
                },
            }
        ).cast(base.schema)
        out = audio_near_duplicates(
            rd.from_arrow(pa.concat_tables([base, extra])), max_hamming=2
        ).to_pandas()
        # halving the volume leaves the sign-of-difference bits intact
        assert any("#half" in b for b in out.id_b)
        row = out[out.id_b.str.contains("#half")].iloc[0]
        assert row.hamming == 0


class TestWavCodec:
    def test_roundtrip_mono(self):
        from linref_ray.media import wav_decode, wav_encode

        rng = np.random.default_rng(4)
        s = rng.integers(-32768, 32767, 4410, dtype=np.int16)
        data = wav_encode(s, 44100)
        out, sr = wav_decode(data)
        assert sr == 44100
        np.testing.assert_array_equal(out, s)

    def test_stereo_downmix_and_extra_chunks(self):
        import struct

        from linref_ray.media import wav_decode

        rng = np.random.default_rng(7)
        st = rng.integers(-1000, 1000, (500, 2)).astype(np.int16)
        payload = st.tobytes()
        data = (
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"LIST" + struct.pack("<I", 4) + b"INFO"  # skipped chunk
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000,
                                    16000 * 4, 4, 16)
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        out, sr = wav_decode(data)
        assert sr == 16000
        exp = st.astype(np.int32).mean(axis=1).astype(np.int16)
        np.testing.assert_array_equal(out, exp)

    def test_features_on_real_wav_corpus(self, ray_session):
        from linref_ray.media import (
            extract_audio_features,
            wav_encode,
        )

        rng = np.random.default_rng(11)
        rows = []
        for i in range(20):
            t = np.arange(8000)
            tone = (3000 * np.sin(2 * np.pi * (100 + 50 * i) * t / 8000))
            rows.append(wav_encode(tone.astype(np.int16), 8000))
        ds = rd.from_arrow(
            pa.table(
                {
                    "audio_id": pa.array(
                        [f"a-{i}" for i in range(20)], pa.string()
                    ),
                    "bytes": pa.array(rows, pa.binary()),
                }
            )
        )
        out = (
            extract_audio_features(ds, concurrency=1)
            .to_pandas()
            .sort_values("audio_id")
            .reset_index(drop=True)
        )
        assert len(out) == 20
        assert (out.rms > 0).all()
        # pure tones: spectral centroid tracks the tone frequency
        f0 = out.loc[out.audio_id == "a-0", "spectral_centroid"].iloc[0]
        f19 = out.loc[out.audio_id == "a-19", "spectral_centroid"].iloc[0]
        assert f19 > f0

    def test_compressed_still_stubbed(self):
        import pytest as _pytest

        from linref_ray.media import decode_audio

        with _pytest.raises(NotImplementedError):
            decode_audio(b"\xff\xfbMP3FRAMEDATA")


class TestOnErrorPolicy:
    """Undecodable media rows: on_error='skip' drops them and streams on;
    the default 'raise' preserves fail-fast semantics."""

    def _bad_audio_table(self):
        import pyarrow as pa

        from linref_ray import synth

        base = synth.make_audio(6, seconds=0.25)
        blobs = base["bytes"].to_pylist()
        blobs[2] = b"\xff\xfb\x90\x00" + b"\x00" * 32  # mp3-ish garbage
        return base.set_column(
            base.schema.get_field_index("bytes"), "bytes",
            pa.array(blobs, pa.binary()),
        )

    def test_audio_features_skip_and_raise(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from linref_ray.media import extract_audio_features

        bad = self._bad_audio_table()
        out = extract_audio_features(
            rd.from_arrow(bad), concurrency=1, on_error="skip"
        ).to_pandas()
        assert len(out) == 5
        assert "aud-000002" not in set(out["audio_id"])
        with _pytest.raises(Exception):
            extract_audio_features(
                rd.from_arrow(bad), concurrency=1
            ).to_pandas()

    def test_audio_neardup_skip(self, ray_session):
        import ray.data as rd

        from linref_ray.media import audio_near_duplicates

        bad = self._bad_audio_table()
        # with the bad row skipped the remaining tones are all distinct
        out = audio_near_duplicates(
            rd.from_arrow(bad), concurrency=1, on_error="skip"
        ).to_pandas()
        assert "aud-000002" not in set(out.get("id_a", []))

    def test_frame_sample_and_video_sig_skip(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from linref_ray import synth
        from linref_ray.media import sample_frames, video_near_duplicates

        base = synth.make_videos(4, frames=6)
        blobs = base["bytes"].to_pylist()
        blobs[1] = b"MP4\x00not-a-real-container" + b"\x00" * 64
        bad = base.set_column(
            base.schema.get_field_index("bytes"), "bytes",
            pa.array(blobs, pa.binary()),
        )
        frames = sample_frames(
            rd.from_arrow(bad), k=2, concurrency=1, on_error="skip"
        ).to_pandas()
        assert set(frames["video_id"]) == {
            "vid-000000", "vid-000002", "vid-000003"
        }
        pairs = video_near_duplicates(
            rd.from_arrow(bad), concurrency=1, on_error="skip"
        ).to_pandas()
        assert "vid-000001" not in set(pairs.get("id_a", []))
