"""IPA harvest pipeline: TextGrid phone harvesting, inventory generation,
custom symbol-table registration, and metadata re-encoding
(reference: create_ipa_symbols.py, reprocess_with_ipa.py)."""

import json
import os

from expressive_fastspeech2_mandarin_tpu.preprocess.ipa_harvest import (
    harvest_phones,
    reencode_metadata,
    write_inventory,
)
from expressive_fastspeech2_mandarin_tpu.preprocess.textgrid import (
    Interval,
    TextGrid,
    Tier,
    write_textgrid,
)
from expressive_fastspeech2_mandarin_tpu.text import phonemes_to_ids, symbols


def _make_tg(path, phones, dur=0.1):
    ivs, t = [], 0.0
    for p in phones:
        ivs.append(Interval(t, t + dur, p))
        t += dur
    tg = TextGrid(xmin=0.0, xmax=t, tiers=[Tier("phones", ivs)])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_textgrid(tg, path)


def _corpus(root):
    _make_tg(os.path.join(root, "0001", "a.TextGrid"),
             ["", "tɕ˥˩", "a˧˥", "", "n"])
    _make_tg(os.path.join(root, "0001", "b.TextGrid"), ["a˧˥", "ʂ", "n"])
    _make_tg(os.path.join(root, "0002", "c.TextGrid"), ["n", "a˧˥"])


def test_harvest_counts_and_inventory(tmp_path):
    root = str(tmp_path / "tg")
    _corpus(root)
    counts = harvest_phones(root)
    assert counts["a˧˥"] == 3 and counts["n"] == 3
    assert counts["tɕ˥˩"] == 1 and "" not in counts

    inv_path = str(tmp_path / "inv.json")
    data = write_inventory(counts, inv_path, name="esd-ipa")
    assert data["phonemes"] == sorted(counts)
    with open(inv_path) as f:
        assert json.load(f)["name"] == "esd-ipa"


def test_custom_table_roundtrip(tmp_path):
    root = str(tmp_path / "tg")
    _corpus(root)
    inv_path = str(tmp_path / "inv.json")
    write_inventory(harvest_phones(root), inv_path, name="esd-ipa-test")
    name = symbols.load_symbol_table(inv_path)
    assert name == "esd-ipa-test"
    table = symbols.get_symbol_table(name)
    # Base symbols keep their reference IDs; phones are @-prefixed.
    assert table[symbols.PAD] == 0
    assert "@a˧˥" in table
    ids = phonemes_to_ids(["@a˧˥", "@n"], table=name)
    assert len(ids) == 2 and all(i >= 64 for i in ids)


def test_symbol_table_json_path_autoload(tmp_path):
    """``symbol_table: path/to/inventory.json`` must work everywhere a table
    name is accepted (config -> dataset -> CLI subprocess) without an
    explicit load call."""
    root = str(tmp_path / "tg")
    _corpus(root)
    inv_path = str(tmp_path / "inv.json")
    write_inventory(harvest_phones(root), inv_path, name="autoload-test")
    # No load_symbol_table call: the path itself is the table name.
    table = symbols.get_symbol_table(inv_path)
    assert table[symbols.PAD] == 0 and "@a˧˥" in table
    syms = symbols.get_symbols(inv_path)
    assert syms[symbols.PAD_ID] == symbols.PAD  # base symbols lead
    ids = phonemes_to_ids(["@a˧˥", "@n"], table=inv_path)
    assert len(ids) == 2


def test_reencode_metadata(tmp_path):
    root = str(tmp_path / "tg")
    _corpus(root)
    meta_in = str(tmp_path / "train.txt")
    with open(meta_in, "w") as f:
        f.write("a|0001|{x y}|raw|0001|text|Happy|0.7|0.8\n")
        f.write("missing|0001|{x}|raw|0001|text|Sad|0.2|0.3\n")
        f.write("c|0002|{x}|raw|0002|text|Angry|0.9|0.1\n")
    meta_out = str(tmp_path / "train_ipa.txt")
    written, dropped = reencode_metadata(meta_in, root, meta_out)
    assert (written, dropped) == (2, 1)
    lines = open(meta_out).read().splitlines()
    # Interior gap interval reencodes as @sp so the phone stream stays 1:1
    # with the stored duration array (preprocessor get_alignment semantics).
    assert lines[0].split("|")[2] == "{@tɕ˥˩ @a˧˥ @sp @n}"
    assert lines[1].split("|")[0] == "c"
    # All other fields preserved.
    assert lines[0].split("|")[6:] == ["Happy", "0.7", "0.8"]


def test_get_alignment_gap_marks(tmp_path):
    """Empty-mark gap intervals (MFA + native-aligner TextGrids) must be
    classified as silence: a trailing ``sil + ""`` pair is trimmed, an
    interior gap becomes an ``sp`` with its duration — so phones and
    durations stay 1:1 (the reference keeps "" as a phone, which defeats
    its tail trim; see preprocessor.get_alignment docstring)."""
    from expressive_fastspeech2_mandarin_tpu.preprocess.ipa_harvest import (
        textgrid_phones,
    )
    from expressive_fastspeech2_mandarin_tpu.preprocess.preprocessor import (
        get_alignment,
    )

    path = str(tmp_path / "g.TextGrid")
    _make_tg(path, ["sil", "b", "", "a", "sil", ""])
    tg_phones = textgrid_phones(path)
    from expressive_fastspeech2_mandarin_tpu.preprocess.textgrid import (
        read_textgrid,
    )

    tier = read_textgrid(path).get_tier_by_name("phones")
    align = get_alignment(tier, sampling_rate=16000, hop_length=200)
    assert align.phones == ["b", "sp", "a"]
    assert len(align.durations) == 3
    assert tg_phones == align.phones  # reencode stays 1:1 with durations
