"""Data pipeline tests: CSV manifest, path layout, augmentation determinism,
tokenizer framing, loader batching."""

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from cor_tpu.data.augment import train_augment
from cor_tpu.data.pipeline import (
    CORDataset,
    DataLoader,
    SyntheticDataset,
    load_manifest,
)
from cor_tpu.data.tokenizer import HashTokenizer, canonicalize_text


@pytest.fixture
def fake_cor_root(tmp_path):
    """Build a miniature COR127K layout + CSV manifest."""
    root = tmp_path / "data"
    csv_path = tmp_path / "Train.csv"
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        ds = "Test_1"
        target = "0q1n"
        qi, qm = f"q{i}.jpg", f"q{i}.png"
        si, sm = f"s{i}.jpg", f"s{i}.png"
        (root / ds / "image").mkdir(parents=True, exist_ok=True)
        (root / ds / "mask" / target).mkdir(parents=True, exist_ok=True)
        (root / ds / "mask" / "sup").mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8), "RGB").save(
            root / ds / "image" / qi
        )
        Image.fromarray((rng.random((48, 64)) > 0.5).astype(np.uint8) * 255, "L").save(
            root / ds / "mask" / target / qm
        )
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8), "RGB").save(
            root / ds / "image" / si
        )
        Image.fromarray((rng.random((40, 40)) > 0.5).astype(np.uint8) * 255, "L").save(
            root / ds / "mask" / "sup" / sm
        )
        rows.append(
            dict(
                Id=i,
                Compose=0 if i < 4 else 1,  # 2 rows filtered out
                Dataset=ds,
                Target=target,
                Query_img=qi,
                Query_mask=qm,
                Support_img=si,
                Support_mask=sm,
                Text=f"change color to blue {i}",
            )
        )
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return root, csv_path


def test_manifest_compose_filter(fake_cor_root):
    _, csv_path = fake_cor_root
    df = load_manifest(csv_path)
    assert len(df) == 4  # Compose == 0 only (dataloader.py:91)


def test_cor_dataset_shapes_and_loader(fake_cor_root):
    root, csv_path = fake_cor_root
    ds = CORDataset(
        csv_path=str(csv_path),
        dataset_path=str(root),
        train=False,
        query_img_size=64,
        support_img_size=32,
        context_length=16,
    )
    assert len(ds) == 4
    s = ds[0]
    assert s["query_img"].shape == (64, 64, 3)
    assert s["query_mask"].shape == (64, 64, 1)
    assert s["support_img"].shape == (32, 32, 3)
    assert s["support_mask"].shape == (32, 32, 1)
    assert s["text"].shape == (16,)
    assert s["query_mask"].min() >= 0.0 and s["query_mask"].max() <= 1.0
    assert tuple(s["native_hw"]) == (48, 64)

    loader = DataLoader(ds, batch_size=3, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["query_img"].shape == (3, 64, 64, 3)
    assert batches[1]["query_img"].shape == (1, 64, 64, 3)


def test_loader_surfaces_worker_errors(fake_cor_root, tmp_path):
    """A sample that fails to load inside a prefetch worker thread must
    propagate to the consuming iterator (and thence to a non-zero CLI exit),
    never hang the queue or silently end the epoch early."""
    import shutil

    root, csv_path = fake_cor_root
    broken_root = tmp_path / "broken"
    shutil.copytree(root, broken_root)
    for victim in (broken_root / "Test_1" / "image").glob("q*.jpg"):
        victim.unlink()
    ds = CORDataset(
        csv_path=str(csv_path),
        dataset_path=str(broken_root),
        train=False,
        query_img_size=64,
        support_img_size=32,
        context_length=16,
    )
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(FileNotFoundError):
        list(loader)


def test_manifest_limit_truncation(fake_cor_root):
    """limit= keeps the first N post-filter rows (the working form of the
    reference's commented debug-truncation, dataloader.py:89,257) — exposed
    as --limit on the eval/retrieve/index CLIs."""
    root, csv_path = fake_cor_root
    ds = CORDataset(
        csv_path=str(csv_path), dataset_path=str(root), train=False,
        query_img_size=64, support_img_size=32, context_length=16, limit=2,
    )
    assert len(ds) == 2
    full = CORDataset(
        csv_path=str(csv_path), dataset_path=str(root), train=False,
        query_img_size=64, support_img_size=32, context_length=16,
    )
    assert list(ds.df["Id"]) == list(full.df["Id"][:2])
    # a negative limit would silently become iloc[:-N] (keep all but the
    # last N) — the opposite of the documented truncation; it must raise
    with pytest.raises(ValueError, match="positive row count"):
        CORDataset(
            csv_path=str(csv_path), dataset_path=str(root), train=False,
            query_img_size=64, support_img_size=32, context_length=16,
            limit=-5,
        )


def test_capitalized_dirs_layout(fake_cor_root, tmp_path):
    """TestDataset_Single's Image/Mask capitalized layout (reference:
    utils/dataloader.py:480-484) loads via capitalized_dirs=True."""
    root, csv_path = fake_cor_root
    cap_root = tmp_path / "cap_data"
    ds_dir = root / "Test_1"
    cap_ds = cap_root / "Test_1"
    cap_ds.mkdir(parents=True)
    (ds_dir / "image").rename(cap_ds / "Image")
    (ds_dir / "mask").rename(cap_ds / "Mask")

    with pytest.raises(FileNotFoundError):
        CORDataset(
            csv_path=str(csv_path), dataset_path=str(cap_root), train=False,
            query_img_size=64, support_img_size=32, context_length=16,
        )[0]
    ds = CORDataset(
        csv_path=str(csv_path), dataset_path=str(cap_root), train=False,
        query_img_size=64, support_img_size=32, context_length=16,
        capitalized_dirs=True,
    )
    s = ds[0]
    assert s["query_img"].shape == (64, 64, 3)
    assert s["support_mask"].shape == (32, 32, 1)


def test_train_augmentation_is_applied_and_seeded(fake_cor_root):
    root, csv_path = fake_cor_root
    kw = dict(
        csv_path=str(csv_path),
        dataset_path=str(root),
        query_img_size=64,
        support_img_size=32,
        context_length=16,
    )
    plain = CORDataset(train=False, **kw)[0]
    aug1 = CORDataset(train=True, seed=1, **kw)[0]
    # augmented query differs from plain with overwhelming probability
    assert not np.allclose(plain["query_img"], aug1["query_img"])
    # support path is never augmented (dataloader.py:176-180)
    np.testing.assert_allclose(plain["support_img"], aug1["support_img"])


def test_augment_chain_preserves_pairing(rng):
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (64, 80, 3), np.uint8))
    gt = Image.fromarray(np.random.default_rng(1).integers(0, 2, (64, 80), np.uint8) * 255)
    a_img, a_gt = train_augment(img, gt, np.random.default_rng(3))
    assert a_img.size == a_gt.size  # joint crop keeps them aligned


def test_hash_tokenizer_framing():
    # SigLIP framing (open_clip HFTokenizer + T5 sentencepiece semantics):
    # [t0..tn, eos, 0, ...] — eos right after the content, zero padding after,
    # position -1 is PAD for short texts (the text tower pools the literal
    # last position with no attention mask).
    tok = HashTokenizer(context_length=12, vocab_size=100)
    ids = tok(["Change the RED hat to blue!", "Change the red hat to blue"])
    assert ids.shape == (2, 12)
    # canonicalization makes the two rows identical
    np.testing.assert_array_equal(ids[0], ids[1])
    assert ids.dtype == np.int32
    assert (ids[0, :6] >= 2).all()  # 6 content words
    assert ids[0, 6] == 1  # eos immediately after content
    assert (ids[0, 7:] == 0).all()  # pad to the right; position -1 is pad
    # truncation leaves room for eos (HF truncation keeps special tokens)
    long = tok(" ".join(["word%d" % i for i in range(40)]))
    assert long[0, -1] == 1 and (long[0, :-1] >= 2).all()
    # punctuation is removed (not replaced by space), underscores become spaces
    assert canonicalize_text("A_B,c!  d") == "a bc d"


def test_sentencepiece_tokenizer_matches_framing(tmp_path):
    """Build a toy offline HF tokenizer artifact (WordLevel + eos template —
    the T5/SigLIP post-processing shape) and check the wrapper reproduces the
    exact open_clip HFTokenizer call semantics: canonicalize -> encode ->
    max_length pad/truncate, eos after content, pad id 0."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, processors
    from transformers import PreTrainedTokenizerFast

    words = ["change", "the", "red", "hat", "to", "blue", "a", "b"]
    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    vocab.update({w: i + 3 for i, w in enumerate(words)})
    t = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    t.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)]
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=t, pad_token="<pad>", eos_token="</s>", unk_token="<unk>"
    )
    art = tmp_path / "toy_tok"
    fast.save_pretrained(str(art))

    from cor_tpu.data.tokenizer import SentencePieceTokenizer, frame_ids, get_tokenizer

    tok = SentencePieceTokenizer(str(art), context_length=10)
    ids = tok(["Change the RED hat!"])  # canonicalize lowers + strips "!"
    content = [vocab["change"], vocab["the"], vocab["red"], vocab["hat"]]
    np.testing.assert_array_equal(ids[0], frame_ids(content, 10))
    # explicit-but-broken path raises instead of silently hashing
    with pytest.raises(RuntimeError, match="tokenizer_path"):
        get_tokenizer(str(tmp_path / "missing"), 10)


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(length=4, query_img_size=32, support_img_size=16, seed=9)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a["query_img"], b["query_img"])
    assert a["query_mask"].sum() > 0


def test_loader_multihost_sharding():
    """shard_id/num_shards: every host gets an identical shard length (the
    global order is padded by wrapping, DistributedSampler-style) so all
    hosts execute the same number of collective steps; together the shards
    cover the whole epoch."""
    ds = SyntheticDataset(length=21, query_img_size=16, support_img_size=8)
    per_shard = []
    for shard in range(4):
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                            shard_id=shard, num_shards=4)
        ids = [int(i) for b in loader for i in b["pair_id"]]
        assert len(ids) == -(-21 // 4)  # ceil: identical on every host
        per_shard.append(ids)
    seen = [i for ids in per_shard for i in ids]
    assert set(seen) == set(range(21))  # full cover
    assert len(seen) == 24  # 21 + 3 wrap-padded duplicates
    # identical batch COUNTS even with drop_last (the deadlock case)
    lens = [
        len(DataLoader(ds, batch_size=2, shard_id=s, num_shards=4, drop_last=True))
        for s in range(4)
    ]
    assert len(set(lens)) == 1
    # len() reflects the padded shard, not the global dataset
    l0 = DataLoader(ds, batch_size=2, shard_id=0, num_shards=4)
    assert len(l0) == -(-6 // 2)
