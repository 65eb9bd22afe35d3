"""Few-shot prompt templates + endpoint<->trajectory reconciliation resume.

Covers VERDICT r1 missing #4/#5: the template-driven instruction taxonomy
(prompt_traj_to_instruction / prompt_pairwise_judgement_batch /
prompt_phy_to_sem, mirroring vln_trajectory_generator.py:2306-2309 and
prompts/prompt_phy_to_sem.json) and the regeneration of deliberately deleted
endpoint/trajectory halves (:970-1060, 1687-1737).
"""

import json

import pytest

from sage3d_tpu.data import trajectory_gen as tg
from sage3d_tpu.data.llm import MockLLMClient
from sage3d_tpu.data.prompt_templates import (INSTRUCTION_TYPES,
                                              load_prompt_template,
                                              pairwise_judgement_messages,
                                              phy_to_sem_messages,
                                              render_template,
                                              traj_to_instruction_messages)
from tests.test_data_pipeline import make_interiorgs_scene


def test_templates_load_and_have_placeholders():
    t = load_prompt_template("prompt_pairwise_judgement_batch")
    assert t[0]["role"] == "system"
    assert "{scene_map}" in t[1]["content"] and "{pairs_list}" in t[1]["content"]
    t = load_prompt_template("prompt_traj_to_instruction")
    assert "{text}{json}" in t[1]["content"]
    for itype in INSTRUCTION_TYPES:
        assert itype in t[0]["content"]
    t = load_prompt_template("prompt_phy_to_sem")
    # few-shot: system + example user + example assistant + payload user
    assert [m["role"] for m in t] == ["system", "user", "assistant", "user"]
    with pytest.raises(FileNotFoundError):
        load_prompt_template("nope_no_such_template")


def test_render_preserves_literal_braces():
    t = [{"role": "user", "content": 'x={x} and {"json": true} stays'}]
    out = render_template(t, x="7")
    assert out[0]["content"] == 'x=7 and {"json": true} stays'


def test_pairwise_messages_and_mock_verdicts():
    msgs = pairwise_judgement_messages("a map", [("label_1", "label_2"),
                                                ("label_3", "label_4")])
    assert "a map" in msgs[1]["content"]
    assert '"pair_id": 0' in msgs[1]["content"]
    text = MockLLMClient().chat(msgs)
    parsed = json.loads(text)
    assert [p["pair_id"] for p in parsed] == [0, 1]
    assert all(p["meaningful"] for p in parsed)
    # the full judge path keeps both pairs
    kept = tg.judge_pairs_batch(MockLLMClient(), [("label_1", "label_2"),
                                                  ("label_3", "label_4")],
                                "a map")
    assert kept == [("label_1", "label_2"), ("label_3", "label_4")]
    rejected = tg.judge_pairs_batch(
        MockLLMClient(accept_all_pairs=False),
        [("label_1", "label_2")], "a map")
    assert rejected == []


def test_instruction_generation_through_template():
    msgs = traj_to_instruction_messages("the map", "label_1", "label_2")
    assert '"starting_point": "label_1"' in msgs[1]["content"]
    out = tg.generate_instructions(MockLLMClient(), "the map",
                                   "label_1", "label_2")
    types = {r["instruction_type"] for r in out}
    assert set(INSTRUCTION_TYPES) <= types          # every type covered
    assert len(out) >= 2 * len(INSTRUCTION_TYPES)   # 2-4 per type
    for r in out:
        assert r["start"] == "label_1" and r["end"] == "label_2"
        assert r["generated_instruction"]
    # failing client -> per-type Default fallback
    class DeadClient(MockLLMClient):
        def chat(self, *a, **k):
            raise RuntimeError("down")
    fallback = tg.generate_instructions(DeadClient(), "m", "a", "b")
    assert len(fallback) == len(INSTRUCTION_TYPES)
    assert all(r["instruction_type"] == "Default" for r in fallback)


def test_phy_to_sem_fewshot_payload():
    msgs = phy_to_sem_messages({"chair_01": "(0,0,0), (1,1,1)"})
    assert msgs[0]["role"] == "system"
    assert "chair_01" in msgs[-1]["content"]
    # the few-shot example is intact in the middle
    assert msgs[2]["role"] == "assistant" and "Overview" in msgs[2]["content"]


@pytest.fixture()
def traj_world(tmp_path):
    scene_dir = make_interiorgs_scene(tmp_path / "raw")
    from sage3d_tpu.data import semantic_map
    semantic_map.build_scene_dir(scene_dir, tmp_path / "maps")
    with open(tmp_path / "maps" / "2D_Semantic_Map_0001_Complete.json") as f:
        sem_data = json.load(f)
    return tmp_path, sem_data


def test_reconciliation_regenerates_deleted_halves(traj_world):
    tmp, sem_data = traj_world
    out = tmp / "traj"
    summary = tg.process_scene("0001", sem_data, out, client=MockLLMClient(),
                               min_trajs=3, max_batches=3, seed=2)
    assert summary["trajectories"] >= 2
    scene_out = out / "0001"
    ep_file = scene_out / "endpoints_gvln_0001.json"
    assert ep_file.exists()

    # 1) delete ALL trajectory parts, keep endpoints -> regenerate from them
    n_endpoints = len(json.load(open(ep_file)))
    for p in scene_out.glob("trajectories_*part*.json"):
        p.unlink()
    rep = tg.reconcile_endpoints_trajectories("0001", sem_data, out,
                                              client=MockLLMClient())
    assert rep["missing_trajectories"] == n_endpoints
    assert rep["regenerated_trajectories"] >= 1
    pairs_after = tg.check_endpoint_trajectory_pairs(scene_out, "0001")
    assert pairs_after["missing_trajectories"] == []

    # 2) delete the endpoint file, keep trajectories -> rebuild endpoints
    ep_file.unlink()
    rep2 = tg.reconcile_endpoints_trajectories("0001", sem_data, out,
                                               client=MockLLMClient())
    assert rep2["appended_endpoints"] >= 1
    audit = tg.check_endpoint_trajectory_pairs(scene_out, "0001")
    assert audit["missing_endpoints"] == []
    assert ep_file.exists()

    # 3) clean state is a no-op
    rep3 = tg.reconcile_endpoints_trajectories("0001", sem_data, out,
                                               client=MockLLMClient())
    assert rep3["regenerated_trajectories"] == 0
    assert rep3["appended_endpoints"] == 0


def test_per_trajectory_visualizations_and_merge_rename(traj_world):
    tmp, sem_data = traj_world
    out = tmp / "trajviz"
    tg.process_scene("0001", sem_data, out, client=MockLLMClient(),
                     min_trajs=2, max_batches=2, seed=5, visualize=True)
    scene_out = out / "0001"
    pngs = list((scene_out / "visualization").glob("trajectory_*.png"))
    assert pngs, "per-trajectory PNGs missing"

    # simulate the 2d->3d stage output, then merge renames visualizations
    import shutil
    for p in scene_out.glob("trajectories_*part*.json"):
        shutil.copy2(p, p.with_name(p.stem + "_trans.json"))
    from sage3d_tpu.data.merge import merge_scene
    merged = merge_scene(scene_out, prefix="gvln")
    assert merged is not None
    renamed = list((scene_out / "visualization_merged").glob("trajectory_*.png"))
    assert len(renamed) == len(pngs)
