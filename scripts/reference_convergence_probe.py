"""Does the REFERENCE converge on the tiny memorizable 16-pair dataset?

tests/test_convergence.py found that training with the reference's DEFAULT
loss weights at random-ish init collapses to the uniform plateau (R@1 stuck
at chance) — the Sinkhorn uniform loss on the UNNORMALIZED global logits
dominates.  Our step math golden-matches the reference (4.5e-6 over 3 full
steps, tests/test_reference_parity.py), so the collapse should be the
reference's own dynamics.  This probe runs the reference torch stack itself
on the same protocol to confirm.

Usage: python scripts/reference_convergence_probe.py [steps] [lr] [UW NW KW]
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import torch  # noqa: E402

import test_reference_parity as trp  # noqa: E402  (installs reference stubs)
from NeighborRetr.models import optimization as ref_optim  # noqa: E402

B, N = 8, 16
MW, MF, RES, VOCAB = trp.MW, trp.MF, trp.RES, trp.VOCAB


def _dataset():
    rng = np.random.default_rng(0)
    text_ids = rng.integers(1, VOCAB - 1, size=(N, MW)).astype(np.int64)
    text_mask = np.zeros((N, MW), np.float32)
    for i in range(N):
        n = int(rng.integers(4, MW + 1))
        text_mask[i, :n] = 1
        text_ids[i, n - 1] = VOCAB - 1
        text_ids[i, n:] = 0
    video = rng.normal(size=(N, MF, RES, RES, 3)).astype(np.float32)
    video_mask = np.ones((N, MF), np.float32)
    return dict(text_ids=text_ids, text_mask=text_mask, video=video,
                video_mask=video_mask, idx=np.arange(N, dtype=np.int64))


def _r1(ref, data):
    with torch.no_grad():
        t = ref.get_text_feat(torch.from_numpy(data["text_ids"]),
                              torch.from_numpy(data["text_mask"]),
                              shaped=True)
        frames = torch.from_numpy(
            data["video"].transpose(0, 1, 4, 2, 3).reshape(-1, 3, RES, RES))
        v = ref.get_video_feat(frames, torch.from_numpy(data["video_mask"]),
                               shaped=True)
        sim, _ = ref.get_similarity_logits(
            t, v, torch.from_numpy(data["text_mask"]),
            torch.from_numpy(data["video_mask"]), shaped=True)
    sim = sim.numpy()
    def r1(m):
        order = np.argsort(-m, axis=1)
        return 100.0 * float(np.mean(order[:, 0] == np.arange(len(m))))
    return r1(sim), r1(sim.T)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 5e-3
    uw = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    nw = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    kw = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0

    ref = trp.ref_model.__wrapped__()
    ref.config.uniform_weight = uw      # modeling.py:355-357
    ref.config.neighbor_weight = nw
    ref.config.kl_weight = kw
    ref.train().float()
    data = _dataset()
    print("init R@1:", _r1(ref, data))

    # epoch-start bank fill (memory_bank.py:124-211): both batches
    with torch.no_grad():
        ts, vs = [], []
        for i in range(N // B):
            sl = slice(i * B, (i + 1) * B)
            t = ref.get_text_feat(torch.from_numpy(data["text_ids"][sl]),
                                  torch.from_numpy(data["text_mask"][sl]),
                                  shaped=True)
            frames = torch.from_numpy(
                data["video"][sl].transpose(0, 1, 4, 2, 3)
                .reshape(-1, 3, RES, RES))
            v = ref.get_video_feat(frames,
                                   torch.from_numpy(data["video_mask"][sl]),
                                   shaped=True)
            ts.append(t), vs.append(v)
    ref.mb_ind = torch.from_numpy(data["idx"].copy())
    ref.mb_feat_t = torch.cat(ts)
    ref.mb_feat_v = torch.cat(vs)
    ref.mb_mask_t = torch.from_numpy(data["text_mask"].copy())
    ref.mb_mask_v = torch.from_numpy(data["video_mask"].copy())
    ref.mb_batch = N

    # prep_optimizer grouping (optimizer.py:39-58) at coef_lr=1.0
    named = list(ref.named_parameters())
    no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]
    dec = [p for n, p in named if not any(nd in n for nd in no_decay)]
    nod = [p for n, p in named if any(nd in n for nd in no_decay)]
    opt = ref_optim.BertAdam(
        [{"params": dec, "weight_decay": 0.2},
         {"params": nod, "weight_decay": 0.0}],
        lr=lr, warmup=0.02, schedule="warmup_cosine", b1=0.9, b2=0.98,
        e=1e-6, t_total=steps, weight_decay=0.2, max_grad_norm=1.0)

    for s in range(steps):
        sl = slice((s % 2) * B, (s % 2) * B + B)
        for _, p in named:
            p.grad = None
        out = ref(torch.from_numpy(data["text_ids"][sl]),
                  torch.from_numpy(data["text_mask"][sl]),
                  torch.from_numpy(
                      data["video"][sl].transpose(0, 1, 4, 2, 3)),
                  torch.from_numpy(data["video_mask"][sl]),
                  torch.from_numpy(data["idx"][sl]))
        out[0].backward()
        torch.nn.utils.clip_grad_norm_([p for _, p in named], 1.0)
        opt.step()
        with torch.no_grad():
            ref.clip.logit_scale.clamp_(max=float(math.log(100.0)))
        if (s + 1) % 20 == 0 or s == 0:
            ls = float(ref.clip.logit_scale.exp())
            print(f"step {s+1:4d} R@1={_r1(ref, data)} "
                  f"loss={float(out[0]):.3f} cen={float(out[1]):.3f} "
                  f"uni={float(out[2]):.3f} nb={float(out[3]):.3f} "
                  f"kl={float(out[4]):.3f} exp(ls)={ls:.2f}")
            ref.train()


if __name__ == "__main__":
    main()
