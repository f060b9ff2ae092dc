#!/usr/bin/env python3
"""Generate sklearn-shaped pickle fixtures WITHOUT sklearn installed.

The classes below are plain shells whose __module__/__qualname__ are set to
the real sklearn paths, so the emitted pickle streams are byte-compatible
with what a user's `pickle.dump(model)` produces for attribute-pickled
estimators (sklearn persists everything relevant in __dict__, plus the
Cython Tree via __reduce__ — mirrored here). The learned parameters are
fixed constants; the same constants are baked into the DuckDB oracle SQL in
MlSuite.scala. Regenerating this file reproduces identical model behavior.

Run: python3 scripts/gen_sklearn_fixtures.py   (writes src/main/resources/)
"""
import numpy as np
import pickle
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main", "resources")

NODE_DTYPE = np.dtype({
    "names": ["left_child", "right_child", "feature", "threshold",
              "impurity", "n_node_samples", "weighted_n_node_samples"],
    "formats": ["<i8", "<i8", "<i8", "<f8", "<f8", "<i8", "<f8"],
})


import sys
import types


def _register(module, name, cls):
    """Make `module.name` importable so pickle's save-by-reference check
    passes (the stream only records the dotted path, never the class)."""
    parts = module.split(".")
    for i in range(1, len(parts) + 1):
        mpath = ".".join(parts[:i])
        if mpath not in sys.modules:
            sys.modules[mpath] = types.ModuleType(mpath)
        if i > 1:
            setattr(sys.modules[".".join(parts[:i - 1])], parts[i - 1],
                    sys.modules[mpath])
    setattr(sys.modules[module], name, cls)


_CLASSES = {}


def shell(module, name, **attrs):
    key = (module, name)
    if key not in _CLASSES:
        cls = type(name, (), {})
        cls.__module__ = module
        cls.__qualname__ = name
        _register(module, name, cls)
        _CLASSES[key] = cls
    obj = _CLASSES[key]()
    obj.__dict__.update(attrs)
    return obj


def make_tree(nodes, leaf_values):
    """nodes: list of (left, right, feature, threshold); -1 left => leaf."""
    n = len(nodes)
    arr = np.zeros(n, dtype=NODE_DTYPE)
    for i, (l, r, f, t) in enumerate(nodes):
        arr[i] = (l, r, f, t, 0.0, 1, 1.0)
    values = np.array(leaf_values, dtype="<f8").reshape(n, 1, 1)
    state = {"max_depth": 8, "node_count": n, "nodes": arr, "values": values}

    key = ("sklearn.tree._tree", "Tree")
    if key not in _CLASSES:
        cls = type("Tree", (), {})
        cls.__module__ = "sklearn.tree._tree"
        cls.__qualname__ = "Tree"
        cls.__reduce__ = lambda self: (
            type(self), (1, np.array([1], dtype=np.intp), 1), self._state)
        _register("sklearn.tree._tree", "Tree", cls)
        _CLASSES[key] = cls
    tree = _CLASSES[key]()
    tree._state = state
    return tree


def dt_regressor(tree):
    return shell("sklearn.tree._classes", "DecisionTreeRegressor",
                 criterion="squared_error", max_depth=3, n_features_in_=1,
                 n_outputs_=1, tree_=tree)


def main():
    os.makedirs(OUT, exist_ok=True)

    # ---- linear: BasePredictor-style wrapper (scaler + LinearRegression)
    scaler = shell("sklearn.preprocessing._data", "StandardScaler",
                   with_mean=True, with_std=True,
                   mean_=np.array([4500.0, 12.0]),
                   scale_=np.array([3000.0, 7.0]),
                   n_features_in_=2)
    lin = shell("sklearn.linear_model._base", "LinearRegression",
                fit_intercept=True,
                coef_=np.array([123.45, -67.8]),
                intercept_=np.float64(10.0))
    wrapper = shell("predictor", "LinearRegressionPredictor",
                    scaler=scaler, model=lin,
                    feature_names=["c_acctbal", "c_nationkey"])
    with open(os.path.join(OUT, "sklearn_linear.pkl"), "wb") as f:
        pickle.dump(wrapper, f, protocol=4)

    # ---- random forest: 3 hand-built depth<=2 stumps over one feature
    # tree layout: node0 root; (-1,-1,...) = leaf
    t1 = make_tree(
        [(1, 2, 0, 3000.0), (-1, -1, -2, -2.0), (3, 4, 0, 7000.0),
         (-1, -1, -2, -2.0), (-1, -1, -2, -2.0)],
        [0.0, 100.0, 0.0, 250.0, 400.0])
    t2 = make_tree(
        [(1, 2, 0, 5000.0), (-1, -1, -2, -2.0), (-1, -1, -2, -2.0)],
        [0.0, 120.0, 380.0])
    t3 = make_tree(
        [(1, 2, 0, 1000.0), (-1, -1, -2, -2.0), (3, 4, 0, 9000.0),
         (-1, -1, -2, -2.0), (-1, -1, -2, -2.0)],
        [0.0, 80.0, 0.0, 260.0, 430.0])
    rf = shell("sklearn.ensemble._forest", "RandomForestRegressor",
               n_estimators=3, n_features_in_=1, n_outputs_=1,
               estimators_=[dt_regressor(t) for t in (t1, t2, t3)])
    with open(os.path.join(OUT, "sklearn_rf.pkl"), "wb") as f:
        pickle.dump(rf, f, protocol=4)

    # ---- gradient boosting: constant init + 2 stumps, lr=0.1
    g1 = make_tree([(1, 2, 0, 4000.0), (-1, -1, -2, -2.0), (-1, -1, -2, -2.0)],
                   [0.0, -500.0, 1500.0])
    g2 = make_tree([(1, 2, 0, 8000.0), (-1, -1, -2, -2.0), (-1, -1, -2, -2.0)],
                   [0.0, -200.0, 900.0])
    init = shell("sklearn.dummy", "DummyRegressor",
                 strategy="mean", constant_=np.array([[5000.0]]))
    ests = np.empty((2, 1), dtype=object)
    ests[0, 0] = dt_regressor(g1)
    ests[1, 0] = dt_regressor(g2)
    gbt = shell("sklearn.ensemble._gb", "GradientBoostingRegressor",
                learning_rate=0.1, n_estimators=2, init_=init,
                estimators_=ests)
    with open(os.path.join(OUT, "sklearn_gbt.pkl"), "wb") as f:
        pickle.dump(gbt, f, protocol=4)

    # ---- binary logistic classifier over one feature
    logit = shell("sklearn.linear_model._logistic", "LogisticRegression",
                  coef_=np.array([[0.001]]),
                  intercept_=np.array([-5.0]),
                  classes_=np.array(["neg", "pos"], dtype=object))
    with open(os.path.join(OUT, "sklearn_logistic.pkl"), "wb") as f:
        pickle.dump(logit, f, protocol=4)

    # ---- tiny MLPRegressor: 2 -> 2 (ReLU) -> 1 (identity)
    mlp = shell("sklearn.neural_network._multilayer_perceptron", "MLPRegressor",
                coefs_=[np.array([[1.0, -1.0], [0.5, 2.0]]),
                        np.array([[3.0], [-2.0]])],
                intercepts_=[np.array([0.5, -0.25]), np.array([1.0])],
                activation="relu", n_layers_=3)
    with open(os.path.join(OUT, "sklearn_mlp.pkl"), "wb") as f:
        pickle.dump(mlp, f, protocol=4)

    # unicode-dtype classes_ — what a REAL sklearn fit on string labels
    # stores (np.unique of the labels, '<U3'), unlike the object-dtype
    # fixture above
    logit_u = shell("sklearn.linear_model._logistic", "LogisticRegression",
                    coef_=np.array([[0.001]]),
                    intercept_=np.array([-5.0]),
                    classes_=np.array(["neg", "pos"]))
    with open(os.path.join(OUT, "sklearn_logistic_u.pkl"), "wb") as f:
        pickle.dump(logit_u, f, protocol=4)

    # tanh-activation MLP — the adapter must honor the pickled activation
    mlp_tanh = shell("sklearn.neural_network._multilayer_perceptron", "MLPRegressor",
                     coefs_=[np.array([[1.0], [0.5]]), np.array([[2.0]])],
                     intercepts_=[np.array([0.25]), np.array([-1.0])],
                     activation="tanh", n_layers_=3)
    with open(os.path.join(OUT, "sklearn_mlp_tanh.pkl"), "wb") as f:
        pickle.dump(mlp_tanh, f, protocol=4)

    # a protocol-2 copy of the linear model, to pin cross-protocol parsing
    with open(os.path.join(OUT, "sklearn_linear_p2.pkl"), "wb") as f:
        pickle.dump(wrapper, f, protocol=2)

    print("wrote fixtures to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
