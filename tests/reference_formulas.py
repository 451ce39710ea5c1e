"""Loop-based numpy implementations of the reference's formulas, transcribed
from the cited lines for golden-value tests. Deliberately slow and literal —
these are the spec, the package ops are the implementation under test.
"""
from __future__ import annotations

import numpy as np


# ---- diffusion (model/SpreadMethod/model.py) ----
def ref_general_w(A):
    k_user = A.sum(axis=1).astype(float).copy()
    k_user[k_user == 0] = 1
    return (A.T / k_user) @ A


def ref_probs(A, W_gen):
    k_item = A.sum(axis=0).astype(float).copy()
    k_item[k_item == 0] = 1
    return W_gen / k_item[None, :]


def ref_heats(A, W_gen):
    k_item = A.sum(axis=0).astype(float).copy()
    k_item[k_item == 0] = 1
    return W_gen / k_item[:, None]


def ref_hybrid(A, W_gen, lam):
    k_item = A.sum(axis=0).astype(float)
    denom = np.power(k_item, 1 - lam)[:, None] * np.power(k_item, lam)[None, :]
    denom = denom.copy()
    denom[denom == 0] = 1
    return W_gen / denom


def ref_resource(A, W):
    return A @ W


# ---- spread ranking (model/SpreadMethod/recommend.py:18-50) ----
def ref_rank_filter(F, seen_lists, k, filter_seen=True):
    # NOTE: the reference calls np.argsort with the default (unstable)
    # quicksort, so its order among EQUAL scores is implementation-defined.
    # The spec here pins kind="stable", giving the deterministic
    # "ties -> higher index first" order after the [::-1] reversal; the
    # package implements exactly that.
    out = []
    for uid in range(F.shape[0]):
        order = np.argsort(F[uid], kind="stable")[::-1]
        if filter_seen:
            seen = set(seen_lists.get(uid, []))
            order = [i for i in order if i not in seen]
        out.append(list(order[:k]))
    return np.array(out)


# ---- accuracy metrics (metrics/accurate.py) ----
def ref_precision_recall(pos_dict, rec, k):
    labels, liked = [], []
    for uid, items in pos_dict.items():
        labels.append([int(i in items) for i in rec[uid]])
        liked.append(len(items))
    labels = np.asarray(labels, dtype=float)
    liked = np.asarray(liked, dtype=float)
    correct = labels.sum(axis=1)
    precision = correct.mean() / k
    recall = (correct / liked).mean()
    return round(float(precision), 5), round(float(recall), 5)


def ref_f1(p, r):
    return round(2 * p * r / (p + r), 5)


def ref_ndcg(pos_dict, rec, k):
    labels = []
    for uid, items in pos_dict.items():
        labels.append([int(i in items) for i in rec[uid]])
    labels = np.asarray(labels, dtype=float)
    discount = 1.0 / np.log2(np.arange(2, k + 2))
    idcg = np.sum(np.ones_like(labels) * discount, axis=1)
    dcg = (labels * discount).sum(axis=1)
    idcg[idcg == 0] = 1
    ndcg = dcg / idcg
    return round(float(np.mean(ndcg)), 5)


# ---- diversity metrics (metrics/diversity.py) ----
def ref_hamming(rec, k):
    U = rec.shape[0]
    total = 0.0
    for i in range(U):
        for j in range(U):
            if i == j:
                continue
            q = len(set(rec[i].tolist()) & set(rec[j].tolist()))
            total += 1 - q / k
    return round(round(total / (U * (U - 1)), 5), 5)


def ref_internal_similarity(rec, degree_dict, interaction, k):
    U = rec.shape[0]
    total = 0.0
    for uid in range(U):
        items = rec[uid].tolist()
        for a in items:
            for b in items:
                if a == b:
                    continue
                ka = degree_dict.get(a, 0)
                kb = degree_dict.get(b, 0)
                if ka == 0 or kb == 0:
                    continue
                cooc = float(np.dot(interaction[:, a], interaction[:, b]))
                total += cooc / np.sqrt(ka * kb)
    return round(total / (U * k * (k - 1)), 5)


# ---- LightGCN forward (model/LightGCN/model.py:40-74) via explicit joint
# adjacency propagation ----
def ref_lightgcn_forward(user_emb, item_emb, edges_u, edges_i, n_users, n_items, K):
    N = n_users + n_items
    A = np.zeros((N, N))
    for u, i in zip(edges_u, edges_i):
        A[u, n_users + i] = 1
        A[n_users + i, u] = 1
    deg = A.sum(axis=1)
    dinv = np.where(deg > 0, 1 / np.sqrt(deg), 0.0)
    A_hat = A * dinv[:, None] * dinv[None, :]
    e = np.concatenate([user_emb, item_emb], axis=0)
    acc = e.copy()
    for _ in range(K):
        e = A_hat @ e
        acc += e
    final = acc / (K + 1)
    return final[:n_users], final[n_users:]
