"""Generate golden numeric fixtures from the reference implementation.

Runs the reference's torch/numpy kernels on CPU (with ``.cuda()`` patched to a
no-op, since the reference hardcodes CUDA placement) and stores their outputs
as ``tests/golden/*.npz``. The checked-in fixtures make the test suite
self-contained; this script only needs re-running if tolerance targets change.

Usage:  python tools/gen_golden.py   (requires /root/reference to be mounted)
"""

import os
import sys

import numpy as np
import torch

REFERENCE = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

if not os.path.isdir(REFERENCE):
    sys.exit("reference repo not available; golden fixtures cannot be regenerated")

# The reference hardcodes .cuda() inside its kernels; run them on CPU.
torch.Tensor.cuda = lambda self, *a, **k: self
_orig_eye = torch.eye


def _seeded(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


sys.path.insert(0, REFERENCE)
sys.path.insert(0, os.path.join(REFERENCE, "h36m"))

from utils import data_utils as ref_du  # noqa: E402
from utils import forward_kinematics as ref_fk  # noqa: E402
from utils import ang2joint as ref_a2j  # noqa: E402

os.makedirs(OUT_DIR, exist_ok=True)


def golden_rotations():
    rs = _seeded(42)
    r = rs.randn(257, 3).astype(np.float32)
    # include exact zeros and tiny vectors (edge cases)
    r[0] = 0.0
    r[1] = 1e-9
    rt = torch.from_numpy(r)
    R = ref_du.expmap2rotmat_torch(rt)
    eul = ref_du.rotmat2euler_torch(R)
    quat = ref_du.rotmat2quat_torch(R)
    equat = ref_du.expmap2quat_torch(rt)

    # gimbal-lock specials: rotations with R[0,2] == +/-1 (y-rotation of +/-pi/2)
    lock = np.array([[0.0, np.pi / 2, 0.0], [0.0, -np.pi / 2, 0.0]], dtype=np.float32)
    R_lock = ref_du.expmap2rotmat_torch(torch.from_numpy(lock))
    # force exact +-1 in the [0, 2] entry to hit the special-case branch
    R_lock_fixed = R_lock.clone()
    R_lock_fixed[0, 0, 2] = -1.0
    R_lock_fixed[1, 0, 2] = 1.0
    eul_lock = ref_du.rotmat2euler_torch(R_lock_fixed)

    # quat -> expmap (numpy reference, per-row) on the unit quats produced by
    # rotmat2quat above, plus identity and a theta>pi case (w<0 hemisphere)
    quats = quat.numpy().astype(np.float64)
    quats = np.concatenate(
        [quats,
         np.array([[1.0, 0, 0, 0],                       # identity
                   [-0.5, np.sqrt(0.75), 0, 0]])], axis=0  # theta > pi branch
    )
    q2e = np.stack([ref_du.quat2expmap(qq) for qq in quats])
    # rotmat -> expmap composition on the reference's own numpy path
    Rn = R.numpy().astype(np.float64)
    r2e = np.stack([ref_du.rotmat2expmap(RR) for RR in Rn])

    np.savez(
        os.path.join(OUT_DIR, "rotations.npz"),
        r=r,
        R=R.numpy(),
        eul=eul.numpy(),
        quat=quat.numpy(),
        equat=equat.numpy(),
        R_lock=R_lock_fixed.numpy(),
        eul_lock=eul_lock.numpy(),
        quats_for_expmap=quats.astype(np.float32),
        quat2expmap=q2e.astype(np.float32),
        rotmat2expmap=r2e.astype(np.float32),
    )
    print("rotations.npz written")


def golden_fkl():
    # The two embedded expmap vectors from the reference FK smoke harness
    # (h36m/utils/forward_kinematics.py:252-277) plus random frames.
    parent, offset, rotInd, expmapInd = ref_fk._some_variables()
    rs = _seeded(7)
    frames = rs.randn(64, 99).astype(np.float32) * 0.4
    frames[:, 0:6] = 0.0
    xyz_t = ref_fk.fkl_torch(
        torch.from_numpy(frames), parent, offset, rotInd, expmapInd
    )
    np.savez(
        os.path.join(OUT_DIR, "fkl.npz"),
        frames=frames,
        xyz=xyz_t.numpy(),
    )
    print("fkl.npz written")


def golden_ang2joint():
    skel = np.load(os.path.join(REFERENCE, "utils/body_models/smpl_skeleton.npz"))
    p3d0 = torch.from_numpy(skel["p3d0"]).float()
    parents = skel["parents"]
    parent = {i: parents[i] for i in range(len(parents))}
    rs = _seeded(11)
    fn = 33
    poses = rs.randn(fn, len(parents), 3).astype(np.float32) * 0.3
    poses[:, 0] = 0.0  # reference zeroes global rotation (dataloader_amass.py:125)
    p3d0_rep = p3d0.repeat([fn, 1, 1])

    # patch the RNG-eps hack in rodrigues to a deterministic zero so the golden
    # outputs are reproducible; the jitter is below float32 resolution anyway.
    orig_normal_ = torch.Tensor.normal_

    def _zero_normal(self, *a, **k):
        return self.fill_(1e-8)

    torch.Tensor.normal_ = _zero_normal
    try:
        out = ref_a2j.ang2joint(p3d0_rep, torch.from_numpy(poses), parent)
    finally:
        torch.Tensor.normal_ = orig_normal_
    np.savez(
        os.path.join(OUT_DIR, "ang2joint.npz"),
        poses=poses,
        p3d0=p3d0.numpy(),
        parents=parents,
        xyz=out.numpy(),
    )
    print("ang2joint.npz written")


def golden_metrics():
    sys.path.insert(0, os.path.join(REFERENCE))
    from h36m.utils import utils_mixer as ref_m

    rs = _seeded(5)
    pred = rs.randn(8, 25, 66).astype(np.float32) * 100.0
    gt = pred + rs.randn(8, 25, 66).astype(np.float32) * 30.0
    pred_t, gt_t = torch.from_numpy(pred), torch.from_numpy(gt)

    mpjpe = ref_m.mpjpe_error(pred_t, gt_t).item()
    auc = ref_m.auc_pck_metric(
        pred_t.view(-1, 25, 22, 3) / 1000.0, gt_t.view(-1, 25, 22, 3) / 1000.0
    ).item()

    ang_pred = rs.randn(4, 25, 99).astype(np.float32) * 0.5
    ang_gt = ang_pred + rs.randn(4, 25, 99).astype(np.float32) * 0.1
    eul = ref_m.euler_error(torch.from_numpy(ang_pred), torch.from_numpy(ang_gt)).item()
    ja = ref_m.joint_angle_error(torch.from_numpy(ang_pred), torch.from_numpy(ang_gt)).item()

    delta = rs.randn(3, 25, 66).astype(np.float32)
    last = rs.randn(3, 66).astype(np.float32)
    dec = ref_m.delta_2_gt(torch.from_numpy(delta).clone(), torch.from_numpy(last))

    np.savez(
        os.path.join(OUT_DIR, "metrics.npz"),
        pred=pred, gt=gt, mpjpe=mpjpe, auc=auc,
        ang_pred=ang_pred, ang_gt=ang_gt, euler=eul, joint_angle=ja,
        delta=delta, last=last, delta_decoded=dec.numpy(),
    )
    print("metrics.npz written")


def golden_find_indices():
    i256 = ref_du.find_indices_256(1500, 1700, 35, input_n=10)
    isrnn = ref_du.find_indices_srnn(1500, 1700, 35, input_n=10)
    np.savez(
        os.path.join(OUT_DIR, "find_indices.npz"),
        i256_1=i256[0], i256_2=i256[1], isrnn_1=isrnn[0], isrnn_2=isrnn[1],
    )
    print("find_indices.npz written")


def _save_model_case(name, model, x, extra=None):
    model.eval()
    with torch.no_grad():
        out = model(x)
    arrays = {f"sd::{k}": v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    arrays["x"] = x.numpy()
    arrays["out"] = out.numpy()
    if extra:
        arrays.update(extra)
    np.savez(os.path.join(OUT_DIR, name), **arrays)
    print(name, "written")


def golden_models():
    sys.path.insert(0, os.path.join(REFERENCE, "conv_mixer"))
    from h36m.mlp_mixer import MlpMixer as RefMlpMixer
    from h36m.conv_mixer_model import ConvMixer as RefConvMixer

    rs = _seeded(21)

    # --- MlpMixer, h36m mpjpe-ish config (mish, dropout inactive in eval) ---
    torch.manual_seed(0)
    m = RefMlpMixer(
        num_classes=66, num_blocks=2, hidden_dim=50, tokens_mlp_dim=20,
        channels_mlp_dim=50, seq_len=10, pred_len=25, activation="mish",
        regularization=0.1, input_size=66, r_se=8, use_se=True,
    )
    x = torch.from_numpy(rs.randn(4, 10, 66).astype(np.float32))
    _save_model_case("model_mlp_mixer.npz", m, x)

    # --- MlpMixer with BatchNorm regularization (-1), gelu ---
    torch.manual_seed(1)
    m = RefMlpMixer(
        num_classes=48, num_blocks=2, hidden_dim=60, tokens_mlp_dim=40,
        channels_mlp_dim=60, seq_len=10, pred_len=10, activation="gelu",
        regularization=-1.0, input_size=48, r_se=4, use_se=True,
    )
    x = torch.from_numpy(rs.randn(4, 10, 48).astype(np.float32))
    m.train()
    with torch.no_grad():
        m(x)  # populate BN running stats
    _save_model_case("model_mlp_mixer_bn.npz", m, x)

    # --- ConvMixer, h36m defaults (k=(1,3), pad (0,1), 1 chan, SE) ---
    torch.manual_seed(2)
    m = RefConvMixer(
        num_blocks=2, dimPosIn=66, dimPosEmb=50, dimPosOut=66, in_nTP=10,
        out_nTP=25, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.1, use_se=True, r_se=8,
        use_max_pooling=False, encoder_n_harmonic_functions=64,
        encoder_omega0=0.1,
    )
    x = torch.from_numpy((rs.randn(4, 10, 66) * 0.5).astype(np.float32))
    _save_model_case("model_conv_mixer.npz", m, x)

    # --- ConvMixer, multi-channel 2D kernel + BN + max pooling ---
    torch.manual_seed(3)
    m = RefConvMixer(
        num_blocks=2, dimPosIn=54, dimPosEmb=32, dimPosOut=54, in_nTP=10,
        out_nTP=5, conv_nChan=3, conv1_kernel_shape=(5, 9),
        conv1_stride=None, conv1_padding=None, mode_conv="twice",
        activation="gelu", regularization=-1.0, use_se=True, r_se=4,
        use_max_pooling=True, encoder_n_harmonic_functions=8,
        encoder_omega0=0.1,
    )
    x = torch.from_numpy((rs.randn(4, 10, 54) * 0.5).astype(np.float32))
    m.train()
    with torch.no_grad():
        m(x)
    _save_model_case("model_conv_mixer_multichan.npz", m, x)

    # --- ConvMixer, mode_conv='once' quirk ---
    torch.manual_seed(4)
    m = RefConvMixer(
        num_blocks=2, dimPosIn=66, dimPosEmb=40, dimPosOut=66, in_nTP=10,
        out_nTP=10, conv_nChan=2, conv1_kernel_shape=(1, 3),
        conv1_padding=None, mode_conv="once", activation="gelu",
        regularization=0.0, use_se=True, r_se=4,
        encoder_n_harmonic_functions=-1,
    )
    x = torch.from_numpy((rs.randn(4, 10, 66) * 0.5).astype(np.float32))
    _save_model_case("model_conv_mixer_once.npz", m, x)


def golden_mixer_variants():
    """Token-only / channel-only MixerBlock variants (incl. the double-residual
    quirk of MixerBlock_Token, mlp_mixer.py:234-236)."""
    from h36m.mlp_mixer import MixerBlock_Channel, MixerBlock_Token

    rs = _seeded(31)
    x = torch.from_numpy(rs.randn(4, 10, 50).astype(np.float32))

    torch.manual_seed(6)
    tok = MixerBlock_Token(tokens_mlp_dim=20, seq_len=10, hidden_dim=50,
                           activation="gelu", regularization=0.0, r_se=4,
                           use_se=True)
    tok.eval()
    with torch.no_grad():
        out_tok = tok(x)

    torch.manual_seed(7)
    ch = MixerBlock_Channel(channels_mlp_dim=30, seq_len=10, hidden_dim=50,
                            activation="gelu", regularization=0.0, r_se=4,
                            use_se=True)
    ch.eval()
    with torch.no_grad():
        out_ch = ch(x)

    arrays = {f"tok::{k}": v.numpy() for k, v in tok.state_dict().items()}
    arrays.update({f"ch::{k}": v.numpy() for k, v in ch.state_dict().items()})
    arrays.update(x=x.numpy(), out_tok=out_tok.numpy(), out_ch=out_ch.numpy())
    np.savez(os.path.join(OUT_DIR, "mixer_variants.npz"), **arrays)
    print("mixer_variants.npz written")


def golden_amass_dataset():
    """Run the reference AMASS Datasets class on a synthetic corpus.

    The reference hardcodes absolute corpus/skeleton paths
    (dataloader_amass.py:31,79); they are redirected via os/np monkeypatches
    (no reference code is modified). os.listdir is sorted to pin the
    (otherwise filesystem-dependent) sequence order our loader uses.
    """
    import tempfile

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from motionmixerconv_tpu.data import fixtures

    td = tempfile.mkdtemp()
    fixtures.make_amass_corpus(td, n_frames=300, frame_rate=50.0, seed=3)

    REF_CORPUS = "/media/bouazia/bouazia_3/AMASS_dataset/"
    REF_SKEL = "/lhome/bouazia/pose_prediction/utils/body_models/smpl_skeleton.npz"
    MY_SKEL = os.path.join(repo_root, "motionmixerconv_tpu", "assets",
                           "smpl_skeleton.npz")

    def redirect(p):
        p = str(p).replace(REF_CORPUS, td + "/")
        return p.replace(REF_SKEL, MY_SKEL)

    real_isdir, real_listdir, real_npload = os.path.isdir, os.listdir, np.load
    os.path.isdir = lambda p: real_isdir(redirect(p))
    os.listdir = lambda p: sorted(real_listdir(redirect(p)))
    np.load = lambda p, *a, **k: real_npload(redirect(p), *a, **k)
    try:
        sys.path.insert(0, os.path.join(REFERENCE, "amass"))
        import dataloader_amass as ref_am

        arrays = {}
        for split in (0, 1, 2):
            ds = ref_am.Datasets(None, 10, 25, 5, split=split)
            idxs = [0, 1, len(ds) // 2, len(ds) - 1]
            arrays[f"s{split}_len"] = np.int64(len(ds))
            arrays[f"s{split}_idxs"] = np.array(idxs)
            arrays[f"s{split}_items"] = np.stack([np.asarray(ds[i]) for i in idxs])
    finally:
        os.path.isdir, os.listdir, np.load = real_isdir, real_listdir, real_npload
    np.savez(os.path.join(OUT_DIR, "dataset_amass.npz"), **arrays)
    print("dataset_amass.npz written")


def golden_autoregressive():
    """Reference rollout (TF + closed-loop) on a fixed ConvMixer."""
    import argparse

    sys.path.insert(0, os.path.join(REFERENCE, "conv_mixer"))
    from h36m.conv_mixer_model import ConvMixer as RefConvMixer
    from h36m.train_autoreg_mixer_h36m import autoregressive_process_batch

    torch.manual_seed(9)
    model = RefConvMixer(
        num_blocks=1, dimPosIn=66, dimPosEmb=30, dimPosOut=66, in_nTP=10,
        out_nTP=5, conv_nChan=1, conv1_kernel_shape=(1, 3), conv1_padding=None,
        mode_conv="twice", activation="gelu", regularization=0.0, use_se=True,
        r_se=2, encoder_n_harmonic_functions=8, encoder_omega0=0.1,
    )
    model.eval()
    args = argparse.Namespace(
        input_n_dataset=10, output_n_dataset=25, input_n_model=10,
        output_n_model=5, step_window=5, loss_type="mpjpe",
    )
    rs = _seeded(17)
    batch = torch.from_numpy((rs.randn(3, 35, 96) * 0.4).astype(np.float32))
    dim_used = np.array(
        [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 21, 22, 23, 24, 25,
         26, 27, 28, 29, 30, 31, 32, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45,
         46, 47, 51, 52, 53, 54, 55, 56, 57, 58, 59, 63, 64, 65, 66, 67, 68,
         75, 76, 77, 78, 79, 80, 81, 82, 83, 87, 88, 89, 90, 91, 92])
    with torch.no_grad():
        loss_tf, pred_tf = autoregressive_process_batch(
            batch.clone(), model, args, dim_used, teacher_forcing=True
        )
        loss_cl, pred_cl = autoregressive_process_batch(
            batch.clone(), model, args, dim_used, teacher_forcing=False
        )
    arrays = {f"sd::{k}": v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    arrays.update(
        batch=batch.numpy(), dim_used=dim_used,
        loss_tf=loss_tf.numpy(), pred_tf=pred_tf.numpy(),
        loss_cl=loss_cl.numpy(), pred_cl=pred_cl.numpy(),
    )
    np.savez(os.path.join(OUT_DIR, "autoregressive.npz"), **arrays)
    print("autoregressive.npz written")


def golden_graph():
    """Execute the reference AMASS graph helpers (dataloader_amass.py:154-213).

    As shipped they crash on this stack three ways (modern networkx rejects
    the nodelist with isolated joints; nx now returns ndarray whose missing
    .A1 breaks normalize_A; np.infty was removed in numpy 2), so the
    historical behavior is restored with era shims — np.matrix input,
    np.infty alias, full-node graph — and the outputs pinned.
    """
    import networkx as nx

    np.infty = getattr(np, "infty", np.inf)
    src = open(os.path.join(REFERENCE, "amass", "dataloader_amass.py")).read()
    g = {"np": np, "nx": nx, "torch": torch}
    exec(compile(src[src.index("def normalize_A"):], "ref_graph", "exec"), g)

    edges = [(0, 1), (0, 2), (1, 4), (5, 2), (7, 4), (8, 5), (7, 10), (8, 11),
             (12, 15), (12, 16), (12, 17), (16, 18), (19, 17), (20, 18),
             (21, 19), (1, 16), (2, 17)]  # dataloader_amass.py:192-205
    G = nx.Graph()
    G.add_nodes_from(range(22))
    G.add_edges_from(edges)
    A = np.matrix(nx.adjacency_matrix(G, nodelist=list(range(22))).todense())
    An = g["normalize_A"](A)
    arrays = {
        "normalized_A": np.asarray(An, np.float64),
        "adj_t4": np.asarray(g["spatio_temporal_graph"](22, 4, An), np.float32),
    }
    np.savez(os.path.join(OUT_DIR, "amass_graph.npz"), **arrays)
    print("amass_graph.npz written")


def _smooth_motion(rs, n_steps, b, t, d, amplitude, noise):
    """(n_steps, b, t, d) batches of smooth sinusoidal 'motion'."""
    tt = np.arange(t)[None, None, :, None]
    out = np.zeros((n_steps * b, 1, t, d), np.float64)
    for _ in range(3):
        freq = rs.uniform(0.2, 2.0, size=(n_steps * b, 1, 1, d))
        phase = rs.uniform(0, 2 * np.pi, size=(n_steps * b, 1, 1, d))
        amp = rs.uniform(0.2, 1.0, size=(n_steps * b, 1, 1, d)) * amplitude / 3
        out = out + amp * np.sin(2 * np.pi * freq * tt / t + phase)
    out = out + rs.randn(n_steps * b, 1, t, d) * noise
    return out.reshape(n_steps, b, t, d).astype(np.float32)


def golden_train_parity():
    """Lockstep optimizer/scheduler trajectory from the reference training.

    Replicates EXACTLY what the reference train loops do per step — h36m
    mpjpe: ``loss = mpjpe_error(model(x/1000), gt_mm)``
    (train_mixer_h36m.py:179-181) and amass:
    ``loss = mpjpe_error(model(x), gt) * 1000`` (train_mixer_amass.py:88-103)
    — with ``optim.Adam(lr, weight_decay=1e-5)`` (:63) and
    ``MultiStepLR.step()`` once per epoch (:248-249). 30 steps = 3 epochs x
    10 steps, milestones [1, 2], so the trajectory crosses TWO lr-decay
    boundaries; any scheduler off-by-one or Adam-coupling mismatch in the
    JAX port shows up as loss/param divergence. Dropout is disabled
    (regularization=0) so the trajectory is deterministic.
    """
    sys.path.insert(0, os.path.join(REFERENCE, "conv_mixer"))
    from h36m.conv_mixer_model import ConvMixer as RefConvMixer
    from h36m.mlp_mixer import MlpMixer as RefMlpMixer
    from h36m.utils.utils_mixer import mpjpe_error

    import torch.optim as optim

    LR, GAMMA, MILESTONES, SPE, EPOCHS = 1e-3, 0.1, [1, 2], 10, 3

    def run(model, batches_in, batches_gt, loss_fn):
        sd_init = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}
        opt = optim.Adam(model.parameters(), lr=LR, weight_decay=1e-05)
        sched = optim.lr_scheduler.MultiStepLR(opt, milestones=MILESTONES, gamma=GAMMA)
        model.train()
        losses, lrs = [], []
        for epoch in range(EPOCHS):
            for s in range(SPE):
                i = epoch * SPE + s
                opt.zero_grad()
                loss = loss_fn(model, batches_in[i], batches_gt[i])
                loss.backward()
                opt.step()
                losses.append(loss.item())
                lrs.append(opt.param_groups[0]["lr"])
            sched.step()
        sd_final = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}
        return sd_init, sd_final, np.array(losses, np.float64), np.array(lrs, np.float64)

    arrays = {
        "lr": np.float64(LR), "gamma": np.float64(GAMMA),
        "milestones": np.array(MILESTONES), "steps_per_epoch": np.int64(SPE),
        "n_steps": np.int64(EPOCHS * SPE),
    }

    # --- ConvMixer, h36m mpjpe CLI defaults (train_mixer_h36m.py:575-595),
    # dropout off ---
    torch.manual_seed(40)
    conv = RefConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=50, dimPosOut=66, in_nTP=10,
        out_nTP=25, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.0, use_se=True, r_se=8,
        use_max_pooling=False, encoder_n_harmonic_functions=64,
        encoder_omega0=0.1,
    )
    rs = _seeded(77)
    # LEARNABLE smooth trajectories (superposed sinusoids + small noise), not
    # white noise: on unpredictable data every gradient element is noise-level
    # and Adam's first-step +-lr*sign(g) makes any two float32 trajectories
    # random-walk apart, leaving nothing to compare. Smooth motion gives
    # sign-stable gradients and a decreasing loss, so optimizer/scheduler
    # drift is actually detectable.
    conv_batches = _smooth_motion(rs, 30, 8, 35, 66, amplitude=300.0, noise=3.0)
    cin = torch.from_numpy(conv_batches[:, :, :10])
    cgt = torch.from_numpy(conv_batches[:, :, 10:35])

    def h36m_loss(model, x, gt):
        return mpjpe_error(model(x / 1000.0), gt)

    # step-0 gradient tree: pins the full forward+backward algebra at 1e-6
    # (independent of optimizer-trajectory float drift)
    conv.zero_grad()
    h36m_loss(conv, cin[0], cgt[0]).backward()
    arrays.update(
        {f"conv_grad0::{k}": p.grad.detach().numpy().copy()
         for k, p in conv.named_parameters()}
    )
    conv.zero_grad()

    sd0, sd1, losses, lrs = run(conv, cin, cgt, h36m_loss)
    arrays.update({f"conv_init::{k}": v for k, v in sd0.items()})
    arrays.update({f"conv_final::{k}": v for k, v in sd1.items()})
    arrays.update(conv_batches=conv_batches, conv_losses=losses, conv_lrs=lrs)

    # --- MlpMixer, amass-style (meters in, loss x1000), dropout off ---
    torch.manual_seed(41)
    mlp = RefMlpMixer(
        num_classes=54, num_blocks=3, hidden_dim=64, tokens_mlp_dim=20,
        channels_mlp_dim=64, seq_len=10, pred_len=25, activation="gelu",
        regularization=0.0, input_size=54, r_se=8, use_se=True,
    )
    mlp_batches = _smooth_motion(rs, 30, 8, 35, 54, amplitude=0.3, noise=0.003)
    min_, mgt = torch.from_numpy(mlp_batches[:, :, :10]), torch.from_numpy(mlp_batches[:, :, 10:35])

    def amass_loss(model, x, gt):
        return mpjpe_error(model(x), gt) * 1000.0

    sd0, sd1, losses, lrs = run(mlp, min_, mgt, amass_loss)
    arrays.update({f"mlp_init::{k}": v for k, v in sd0.items()})
    arrays.update({f"mlp_final::{k}": v for k, v in sd1.items()})
    arrays.update(mlp_batches=mlp_batches, mlp_losses=losses, mlp_lrs=lrs)

    # --- decay-coupling discriminator: same MlpMixer init, weight_decay=1e-2
    # (the production 1e-5 is numerically indistinguishable from decoupled
    # AdamW over 30 steps; 1e-2 separates torch's coupled L2 — decay folded
    # into the gradient BEFORE the Adam moments — from decoupled decay) ---
    mlp.load_state_dict({k: torch.from_numpy(v) for k, v in sd0.items()})
    opt = optim.Adam(mlp.parameters(), lr=LR, weight_decay=1e-2)
    mlp.train()
    wd_losses = []
    for i in range(EPOCHS * SPE):
        opt.zero_grad()
        loss = amass_loss(mlp, min_[i], mgt[i])
        loss.backward()
        opt.step()
        wd_losses.append(loss.item())
    arrays["mlp_wd_losses"] = np.array(wd_losses, np.float64)
    arrays["wd_large"] = np.float64(1e-2)

    np.savez(os.path.join(OUT_DIR, "train_parity.npz"), **arrays)
    print("train_parity.npz written")


def golden_datasets():
    """Run the reference dataset classes over synthetic corpora."""
    import tempfile

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from motionmixerconv_tpu.data import fixtures

    # --- H36M (xyz + angle), train and test splits ---
    with tempfile.TemporaryDirectory() as td:
        fixtures.make_h36m_corpus(td, actions=["walking", "eating"], n_frames=400, seed=123)
        from h36m.datasets.dataset_h36m import H36M_Dataset
        from h36m.datasets.dataset_h36m_ang import H36M_Dataset_Angle

        arrays = {}
        for split in (0, 1, 2):
            ds = H36M_Dataset(td, 10, 25, 5, actions=["walking", "eating"], split=split)
            idxs = [0, 1, len(ds) // 2, len(ds) - 1]
            arrays[f"xyz{split}_len"] = np.int64(len(ds))
            arrays[f"xyz{split}_idxs"] = np.array(idxs)
            arrays[f"xyz{split}_items"] = np.stack([np.asarray(ds[i]) for i in idxs])
            if split == 0:
                arrays["xyz_dims_to_use"] = ds.dimensions_to_use
            dsa = H36M_Dataset_Angle(td, 10, 25, 5, actions=["walking", "eating"], split=split)
            aidxs = [0, 1, len(dsa) // 2, len(dsa) - 1]
            arrays[f"ang{split}_len"] = np.int64(len(dsa))
            arrays[f"ang{split}_idxs"] = np.array(aidxs)
            arrays[f"ang{split}_items"] = np.stack([np.asarray(dsa[i]) for i in aidxs])
        np.savez(os.path.join(OUT_DIR, "dataset_h36m.npz"), **arrays)
        print("dataset_h36m.npz written")

    # --- AIS (with a couple of failed frames) ---
    with tempfile.TemporaryDirectory() as td:
        fixtures.make_ais_corpus(
            td, actions=["actA", "actB"], n_frames=120, fail_frames=(7, 30), seed=5
        )
        import pandas as pd

        # reference passes the removed-in-pandas-2 `axis=0` kwarg (was default)
        _orig_ewm = pd.DataFrame.ewm
        pd.DataFrame.ewm = lambda self, *a, axis=0, **k: _orig_ewm(self, *a, **k)

        from conv_mixer.datasets.dataset_ais_xyz import DatasetAISxyz

        ds = DatasetAISxyz(td, 10, 10, 2, ["actA", "actB"], smoothing_alpha=0.15)
        idxs = [0, 1, len(ds) // 2, len(ds) - 1]
        np.savez(
            os.path.join(OUT_DIR, "dataset_ais.npz"),
            length=np.int64(len(ds)),
            idxs=np.array(idxs),
            items=np.stack([np.asarray(ds[i]) for i in idxs]),
            actA=ds.action_data["actA"].numpy(),
        )
        print("dataset_ais.npz written")


def golden_cmu():
    """Execute the reference CMU loaders + CMU-skeleton FK.

    load_data_cmu (h36m/utils/data_utils.py:333-394) runs as-is on a fixture
    corpus (train + test modes). load_data_cmu_3d cannot run in the reference
    (expmap2xyz_torch_cmu is undefined, :413), but its FK building blocks do:
    fkl_torch (forward_kinematics.py:219-241) is generic over the skeleton,
    so the 38-joint FK golden comes from executing it with
    _some_variables_cmu (:138-216).
    """
    import tempfile

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from motionmixerconv_tpu.data import fixtures

    arrays = {}
    with tempfile.TemporaryDirectory() as td:
        fixtures.make_cmu_corpus(
            td, actions=("basketball", "walking"), n_files=2, n_frames=300,
            seed=77,
        )
        train = ref_du.load_data_cmu(td, ["basketball", "walking"], 10, 25)
        sampled, ignore, use, mean, std = train
        arrays["train_sampled"] = np.asarray(sampled, dtype=np.float32)
        arrays["train_ignore"] = np.asarray(ignore)
        arrays["train_use"] = np.asarray(use)
        arrays["train_mean"] = np.asarray(mean)
        arrays["train_std"] = np.asarray(std)
        test = ref_du.load_data_cmu(
            td, ["basketball", "walking"], 10, 25,
            data_std=np.array(std), data_mean=np.array(mean), is_test=True,
        )
        arrays["test_sampled"] = np.asarray(test[0], dtype=np.float32)
        arrays["test_ignore"] = np.asarray(test[1])
        arrays["test_use"] = np.asarray(test[2])

    # 38-joint FK golden from the executed generic fkl_torch
    parent, offset, rotInd, expmapInd = ref_fk._some_variables_cmu()
    rs = _seeded(31)
    ang = (rs.randn(64, 117) * 0.4).astype(np.float32)
    ang[0] = 0.0  # rest pose
    xyz = ref_fk.fkl_torch(
        torch.from_numpy(ang).float(), parent, offset, rotInd, expmapInd
    )
    arrays["fk_angles"] = ang
    arrays["fk_xyz"] = xyz.detach().numpy()

    np.savez(os.path.join(OUT_DIR, "cmu.npz"), **arrays)
    print("cmu.npz written")


def golden_normalization():
    """SRNN normalization quartet (h36m/utils/data_utils.py:128-277).

    ``revert_output_format`` needs an ``xrange`` shim: the reference loop is
    Python-2 (:192) and raises NameError on any Python 3 — the port fixes
    that (DESIGN.md §5); the golden pins the rest of its semantics.
    """
    import builtins

    rs = _seeded(11)
    n, D = 40, 99
    complete = rs.randn(n, D).astype(np.float32) * 0.4
    complete[:, [3, 17, 42]] = 0.75  # constant dims -> std < 1e-4
    mean, std, ignore, use = ref_du.normalization_stats(complete)

    actions = ["walking", "eating", "smoking"]
    seqs = {"a": rs.randn(12, D).astype(np.float32),
            "b": rs.randn(7, D).astype(np.float32)}
    normed = ref_du.normalize_data(seqs, mean, std, use, actions,
                                   one_hot=False)
    seqs_oh = {k: np.hstack([v, rs.rand(v.shape[0], len(actions))
                             .astype(np.float32)])
               for k, v in seqs.items()}
    normed_oh = ref_du.normalize_data(seqs_oh, mean, std, use, actions,
                                      one_hot=True)
    un = ref_du.unNormalizeData(normed["a"], mean, std, ignore, actions,
                                one_hot=False)
    un_oh = ref_du.unNormalizeData(normed_oh["a"], mean, std, ignore,
                                   actions, one_hot=True)
    poses = [normed["a"][i:i + 1].repeat(3, axis=0) for i in range(5)]
    builtins.xrange = range  # reference :192 is Python-2 (NameError on py3)
    try:
        reverted = ref_du.revert_output_format(poses, mean, std, ignore,
                                               actions, one_hot=False)
    finally:
        del builtins.xrange
    np.savez(
        os.path.join(OUT_DIR, "normalization.npz"),
        complete=complete, mean=mean, std=std,
        ignore=np.array(ignore, dtype=np.int64),
        use=np.array(use, dtype=np.int64),
        seq_a=seqs["a"], seq_b=seqs["b"],
        seq_oh_a=seqs_oh["a"], seq_oh_b=seqs_oh["b"],
        normed_a=normed["a"], normed_b=normed["b"],
        normed_oh_a=normed_oh["a"], normed_oh_b=normed_oh["b"],
        un=un, un_oh=un_oh,
        poses=np.stack(poses), reverted=np.stack(reverted),
    )
    print("normalization.npz written")


if __name__ == "__main__":
    golden_rotations()
    golden_fkl()
    golden_ang2joint()
    golden_metrics()
    golden_find_indices()
    golden_models()
    golden_datasets()
    golden_amass_dataset()
    golden_autoregressive()
    golden_mixer_variants()
    golden_train_parity()
    golden_graph()
    golden_cmu()
    golden_normalization()
