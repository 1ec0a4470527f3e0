"""Tests for the data layer (data/ vs code/readDFW.py + code/readMTP.py)."""

import os

import numpy as np
import pytest

from alink_tpu.data import (
    PersonStacks,
    all_pairs_minibatch,
    balanced_pair_batches,
    load_person_stacks,
    lookup_file,
    make_synthetic_dfw,
    make_synthetic_mtp,
    mtp_all_pairs_minibatch,
    mtp_qualifies,
    scan_dfw,
    scan_mtp,
    split_disguise_data,
)


@pytest.fixture(scope="module")
def dfw_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dfw"))
    return make_synthetic_dfw(root, num_people=5, plain_per_person=3,
                              disguised_per_person=4, impostors_per_person=2,
                              image_size=24)


@pytest.fixture(scope="module")
def mtp_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mtp"))
    return make_synthetic_mtp(os.path.join(root, "train"), num_subjects=4,
                              image_size=24)


class TestManifest:
    def test_dfw_protocol(self, dfw_root):
        people = scan_dfw(dfw_root, "Training_data")
        assert len(people) == 5
        for p in people:
            assert len(p.plain) == 3
            assert len(p.disguised) == 4
            assert len(p.impostor) == 2
            assert all("_h_" in os.path.basename(f) for f in p.disguised)
            assert all("_I_" in os.path.basename(f) for f in p.impostor)

    def test_combine_normal_imp(self, dfw_root):
        """combine_normal_imp folds disguised into plain (readDFW.py:87-94)."""
        people = scan_dfw(dfw_root, "Training_data", combine_normal_imp=True)
        assert all(len(p.plain) == 7 and len(p.disguised) == 0
                   for p in people)

    def test_require_all_groups_drops_incomplete(self, tmp_path):
        root = str(tmp_path)
        make_synthetic_dfw(root, num_people=2, impostors_per_person=0,
                           image_size=16)
        assert scan_dfw(root, "Training_data") == []
        assert len(scan_dfw(root, "Training_data",
                            require_all_groups=False)) == 2

    def test_lookup_file_bom_variants(self, tmp_path):
        bom = "\xef\xbb\xbf"
        d = tmp_path / ("dir" + bom)
        d.mkdir()
        (d / "a.jpg").write_bytes(b"x")
        resolved = lookup_file(str(tmp_path / "dir" / "a.jpg"))
        assert resolved is not None and os.path.exists(resolved)
        assert lookup_file(str(tmp_path / "dir" / "missing.jpg")) is None

    def test_mtp_scan_filters_sessions(self, mtp_root):
        assert mtp_qualifies("001_01_01_051_06.png")
        assert not mtp_qualifies("001_01_01_140_07.png")
        groups = scan_mtp(mtp_root)
        assert sorted(groups) == [1, 2, 3, 4]
        assert all(len(v) == 4 for v in groups.values())


class TestLoader:
    def test_padded_stacks(self, dfw_root):
        people = scan_dfw(dfw_root, "Training_data")
        stacks = load_person_stacks([p.plain for p in people], (24, 24))
        assert stacks.images.shape == (5, 3, 24, 24, 3)
        assert list(stacks.counts) == [3] * 5
        assert stacks.mask().all()

    def test_ragged_padding(self):
        groups = [["x"] * 0, ["x"] * 0]  # empty groups -> zero stacks

        stacks = load_person_stacks([[], []], (8, 8))
        assert stacks.images.shape == (2, 1, 8, 8, 3)
        assert not stacks.mask().any()
        del groups

    def test_map_stacks_batches_featurizer(self):
        images = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.float32)
        stacks = PersonStacks(images, np.array([3, 2], np.int32))
        calls = []

        def fake_featurize(batch):
            calls.append(batch.shape)
            return batch.sum(-1, keepdims=True)

        out = stacks.map_stacks(fake_featurize)
        assert calls == [(6, 4)]  # one batched call, not per person
        assert out.images.shape == (2, 3, 1)


class TestPairs:
    def _stacks(self, counts, dim=2):
        p, s = len(counts), max(counts)
        images = np.zeros((p, s, dim), np.float32)
        for i, c in enumerate(counts):
            for j in range(c):
                images[i, j] = [i, j]
        return PersonStacks(images, np.asarray(counts, np.int32))

    def test_all_pairs_minibatch_counts(self):
        plain = self._stacks([2, 1])
        dig = self._stacks([1, 2])
        left, right, y = all_pairs_minibatch(plain, dig)
        # plain x dig: (2+1)*(1+2) = 9 pairs; dig x dig: 3*3 = 9.
        assert len(y) == 18
        # Genuine = same person index: plain x dig has 2*1 + 1*2 = 4;
        # dig x dig has 1 + 4 = 5.
        assert int(y.sum()) == 9
        # First pair is (person0 img0, person0 img0) per enumeration order.
        np.testing.assert_array_equal(left[0], [0, 0])
        np.testing.assert_array_equal(right[0], [0, 0])

    def test_mtp_all_pairs(self):
        stacks = self._stacks([2, 2])
        left, right, y = mtp_all_pairs_minibatch(stacks)
        assert len(y) == 16
        assert int(y.sum()) == 8

    def test_balanced_batches_are_balanced(self):
        normal = self._stacks([3, 2, 4])
        imp = self._stacks([2, 2, 1])
        gen = balanced_pair_batches(0, normal, imp, 32)
        for _ in range(5):
            (left, right), y = next(gen)
            assert len(y) == 32
            assert int(y.sum()) == 16
            # Genuine pairs must share the person coordinate.
            same_person = left[:, 0] == right[:, 0]
            assert bool(np.all(same_person[y == 1]))

    def test_balanced_batches_without_imp(self):
        normal = self._stacks([3, 3])
        gen = balanced_pair_batches(1, normal, None, 16)
        (left, right), y = next(gen)
        assert int(y.sum()) == 8
        assert bool(np.all(left[y == 0][:, 0] != right[y == 0][:, 0]))

    def test_split_disguise_data(self):
        stacks = self._stacks([4, 3, 1])
        pre, post = split_disguise_data(stacks, pre_ratio=0.5)
        assert list(pre.counts) == [2, 1, 0]
        assert list(post.counts) == [2, 2, 1]
        # Person 0 post images are its images 2, 3 shifted to the front.
        np.testing.assert_array_equal(post.images[0, 0], [0, 2])
        np.testing.assert_array_equal(post.images[0, 1], [0, 3])
        # Padding stays zero.
        np.testing.assert_array_equal(pre.images[2, 0], [0, 0])


class TestEndToEnd:
    def test_manifest_to_pairs(self, dfw_root):
        people = scan_dfw(dfw_root, "Training_data")
        plain = load_person_stacks([p.plain for p in people], (24, 24))
        dig = load_person_stacks([p.disguised for p in people], (24, 24))
        left, right, y = all_pairs_minibatch(
            plain.take_people([0, 1]), dig.take_people([0, 1])
        )
        assert left.shape[1:] == (24, 24, 3)
        assert y.sum() > 0
        # Genuine pairs (same synthetic identity) are closer on average.
        d_gen = np.mean(np.abs(left[y == 1] - right[y == 1]))
        d_imp = np.mean(np.abs(left[y == 0] - right[y == 0]))
        assert d_gen < d_imp


class TestDecodeResilience:
    def test_corrupt_file_zero_filled(self, tmp_path):
        """Corrupt images decode to zero slots instead of raising
        (readDFW.py:81-96 tolerates decode failures)."""
        from alink_tpu.data.loader import load_image_list
        from PIL import Image as PILImage

        good = str(tmp_path / "good.jpg")
        PILImage.fromarray(
            np.full((10, 10, 3), 200, np.uint8)).save(good)
        bad = str(tmp_path / "bad.jpg")
        with open(bad, "wb") as f:
            f.write(b"not an image")
        out = load_image_list([good, bad], (8, 8), backend="pil")
        assert out.shape == (2, 8, 8, 3)
        assert out[0].mean() > 100
        assert out[1].sum() == 0.0
