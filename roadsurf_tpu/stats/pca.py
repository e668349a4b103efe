"""PCA procedure with Kaiser / broken-stick component selection
(reference fct_statistics.py:109-365). sklearn does the decomposition;
figures are matplotlib (individuals .jpg, variables biplot .webp via PIL —
the reference used plotly kaleido for the webp)."""

from __future__ import annotations

import io
import os

import numpy as np
import pandas as pd

from ..utils.misc import ensure_dir_exists


def evplot(ev):
    """Kaiser rule + Broken-stick model (MacArthur 1957) bar plots; returns
    (broken-stick values, figure) (reference fct_statistics.py:109-148)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(ev)
    j = np.arange(n) + 1
    bsm = [1 / n]
    for k in range(n - 1):
        bsm.append(bsm[k] + 1 / (n - 1 - k))
    bsm = [100 * x / n for x in bsm]
    bsm.reverse()
    avg_ev = sum(ev) / len(ev)

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(2, 1, 1)
    bx = fig.add_subplot(2, 1, 2)
    ax.bar(j, ev)
    ax.axhline(y=avg_ev, color="r", linestyle="-")
    bx.bar(j - 0.25, ev, color="y", width=0.5)
    bx.bar(j + 0.25, bsm, color="r", width=0.5)
    return bsm, fig


def determine_pc_num(ev, bsm) -> int:
    """#PCs to keep: min(Kaiser, broken-stick), clamped to [2, 10]
    (reference fct_statistics.py:151-176)."""
    ev = np.asarray(ev)
    kaiser = int(np.sum(ev > ev.mean()))
    bsm_keep = int(np.sum([e > b for e, b in zip(ev, bsm)]))
    keep = min(kaiser, bsm_keep)
    if keep < 2:
        return 2
    if keep > 10:
        return 10
    return keep


def calculate_pca(dataset: pd.DataFrame, features, to_describe, label_pc):
    """StandardScaler → PCA over the feature columns
    (reference fct_statistics.py:179-203)."""
    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    dataset = dataset.reset_index(drop=True)
    x = dataset.loc[:, features].values
    x = StandardScaler().fit_transform(x)
    # sklearn caps n_components at min(n_samples, n_features)
    pca = PCA(n_components=min(len(features), x.shape[0]))
    coor = pca.fit_transform(x)
    return pca, coor


def _save_webp(fig, path: str):
    """matplotlib → .webp via PIL (kaleido-free)."""
    from PIL import Image
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight")
    buf.seek(0)
    Image.open(buf).convert("RGB").save(path, "WEBP")


def _safe_equal_aspect(ax):
    """aspect=1 only when both axes have real extent (a degenerate range
    makes matplotlib's transform singular on save)."""
    x0, x1 = ax.get_xlim()
    y0, y1 = ax.get_ylim()
    if abs(x1 - x0) > 1e-12 and abs(y1 - y0) > 1e-12:
        ax.set_aspect(1)


def plot_pca(coor_PC, results_PCA, pca, features, targets, to_describe,
             pc_to_plot=2, dirpath_images="images", file_prefix="PCA_",
             title_graph="PCA"):
    """Individuals scatter (.jpg) and variables biplot (.webp) per PC pair
    (reference fct_statistics.py:206-293)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    written = []
    expl = [round(x * 100, 2)
            for x in pca.explained_variance_ratio_.tolist()]
    loadings = pca.components_.T * np.sqrt(pca.explained_variance_)
    colors = [k[4:] for k in mcolors.TABLEAU_COLORS.keys()][:len(targets)]

    for pc in range(2, pc_to_plot + 1):
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(1, 1, 1)
        ax.set_xlabel(f"Principal Component 1 ({expl[0]}%)", fontsize=15)
        ax.set_ylabel(f"Principal Component {pc} ({expl[pc - 1]}%)",
                      fontsize=15)
        ax.set_title(title_graph, fontsize=20)
        for target, color in zip(targets, colors):
            keep = results_PCA[to_describe] == target
            ax.scatter(results_PCA.loc[keep, "PC1"],
                       results_PCA.loc[keep, f"PC{pc}"], c=color, s=50)
        ax.legend([str(t) for t in targets])
        _safe_equal_aspect(ax)
        ax.grid()
        p = os.path.join(dirpath_images,
                         file_prefix + f"PC1{pc}_individuals.jpg")
        fig.savefig(p, bbox_inches="tight")
        plt.close(fig)
        written.append(p)

        # variables biplot: loading vectors with labels
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(1, 1, 1)
        ax.set_xlabel(f"Principal component 1 ({expl[0]}%)")
        ax.set_ylabel(f"Principal component {pc} ({expl[pc - 1]}%)")
        ax.set_title(title_graph)
        for i, feature in enumerate(features):
            ax.plot([0, loadings[i, 0]], [0, loadings[i, pc - 1]], "k-",
                    lw=1)
            ax.annotate(str(feature),
                        (loadings[i, 0], loadings[i, pc - 1]),
                        ha="center", va="bottom")
        _safe_equal_aspect(ax)
        ax.grid()
        p = os.path.join(dirpath_images,
                         file_prefix + f"PC1{pc}_features.webp")
        _save_webp(fig, p)
        plt.close(fig)
        written.append(p)
    return written


def pca_procedure(dataset: pd.DataFrame, features, to_describe,
                  dirpath_tables="tables", dirpath_images="images",
                  file_prefix="PCA_", title_graph="PCA") -> list[str]:
    """Full PCA procedure: values CSV, component-selection figure,
    loading + correlation matrices, individuals/variables plots
    (reference fct_statistics.py:296-365)."""
    import matplotlib.pyplot as plt

    written = []
    ensure_dir_exists(dirpath_tables)
    ensure_dir_exists(dirpath_images)
    if not file_prefix.endswith("_"):
        file_prefix += "_"

    pca, coor = calculate_pca(dataset, features, to_describe, None)
    label_pc = [f"PC{x}" for x in range(1, coor.shape[1] + 1)]
    coor_df = pd.DataFrame(coor, columns=label_pc)
    results = pd.concat(
        [coor_df, dataset.reset_index(drop=True)[to_describe]], axis=1)
    p = os.path.join(dirpath_tables, file_prefix + "values.csv")
    results.round(3).to_csv(p, index=False)
    written.append(p)

    ev = pca.explained_variance_
    bsm, fig = evplot(ev)
    pc_to_plot = min(determine_pc_num(ev, bsm), coor.shape[1])
    p = os.path.join(dirpath_images, file_prefix + "PC_to_keep_evplot.jpg")
    fig.savefig(p, bbox_inches="tight")
    plt.close(fig)
    written.append(p)

    loadings = pca.components_.T * np.sqrt(pca.explained_variance_)
    pd.DataFrame(np.round(loadings, 2), columns=label_pc,
                 index=features).to_csv(
        os.path.join(dirpath_tables, file_prefix + "loading_matrix.csv"))
    written.append(os.path.join(dirpath_tables,
                                file_prefix + "loading_matrix.csv"))
    pd.DataFrame(np.round(np.transpose(pca.components_), 2),
                 columns=label_pc, index=features).to_csv(
        os.path.join(dirpath_tables, file_prefix + "corr_matrix.csv"))
    written.append(os.path.join(dirpath_tables,
                                file_prefix + "corr_matrix.csv"))

    targets = dataset[to_describe].unique().tolist()
    written.extend(plot_pca(coor, results, pca, features, targets,
                            to_describe, pc_to_plot, dirpath_images,
                            file_prefix, title_graph))
    return written
