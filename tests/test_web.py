"""Web GUI integration test: upload -> train -> predict through a live
HTTP server (reference test_integration.py:470-527 drives the Flask app
the same way through test_client)."""

import http.client
import json
import os
import threading
import time
from http.server import ThreadingHTTPServer

import pytest

from polymer_chemprop_tpu.web.app import build_app

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture()
def server(tmp_path):
    handler, state = build_app(str(tmp_path))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], state
    srv.shutdown()


def _post(port, path, fields):
    boundary = "XxX"
    parts = []
    for k, v in fields.items():
        parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                     f'name="{k}"\r\n\r\n'.encode() +
                     (v if isinstance(v, bytes) else str(v).encode()) +
                     b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body, headers={
        "Content-Type": f"multipart/form-data; boundary={boundary}"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


class TestWebApp:
    def test_upload_train_predict(self, server):
        port, state = server
        status, body = _get(port, "/")
        assert status == 200 and b"polymer-chemprop-tpu" in body

        with open(os.path.join(DATA, "regression.csv"), "rb") as f:
            csv_bytes = f.read()
        status, _ = _post(port, "/upload_data",
                          {"name": "esol", "class": "regression",
                           "file": csv_bytes})
        assert status == 303
        ds = state.db.datasets()
        assert len(ds) == 1

        status, body = _post(port, "/train",
                             {"dataset_id": ds[0]["id"],
                              "ckpt_name": "m1",
                              "dataset_type": "regression",
                              "epochs": 2})
        assert status == 200
        ckpt_id = json.loads(body)["ckpt_id"]

        deadline = time.time() + 300
        while time.time() < deadline:
            status, body = _get(port, f"/progress/{ckpt_id}")
            prog = json.loads(body)
            if prog["state"] in ("done", "error"):
                break
            time.sleep(2)
        assert prog["state"] == "done", prog

        status, body = _post(port, "/predict",
                             {"ckpt_id": ckpt_id,
                              "smiles": "CCO\nc1ccccc1"})
        assert status == 200 and b"Predictions" in body

    def test_users_and_checkpoint_roundtrip(self, server):
        """User CRUD + checkpoint download/upload (reference web
        views.py user and checkpoint management routes)."""
        port, state = server
        status, _ = _post(port, "/create_user", {"username": "alice"})
        assert status == 303
        assert any(u["username"] == "alice" for u in state.db.users())

        # train something tiny, then download its checkpoint
        with open(os.path.join(DATA, "regression.csv"), "rb") as f:
            csv_bytes = f.read()
        _post(port, "/upload_data", {"name": "d2", "class": "regression",
                                     "file": csv_bytes})
        ds = state.db.datasets()[0]
        status, body = _post(port, "/train",
                             {"dataset_id": ds["id"], "ckpt_name": "m2",
                              "dataset_type": "regression", "epochs": 1})
        ckpt_id = json.loads(body)["ckpt_id"]
        deadline = time.time() + 300
        while time.time() < deadline:
            _, body = _get(port, f"/progress/{ckpt_id}")
            if json.loads(body)["state"] in ("done", "error"):
                break
            time.sleep(2)
        status, blob = _get(port, f"/download_ckpt/{ckpt_id}")
        assert status == 200 and len(blob) > 1000

        # re-import the downloaded checkpoint as a new entry
        status, _ = _post(port, "/upload_checkpoint",
                          {"name": "imported", "file": blob})
        assert status == 303
        names = [c["ckpt_name"] for c in state.db.ckpts()]
        assert "imported" in names


def _post_cookie(port, path, fields, cookie=None):
    boundary = "XxX"
    parts = []
    for k, v in fields.items():
        parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                     f'name="{k}"\r\n\r\n'.encode() +
                     (v if isinstance(v, bytes) else str(v).encode()) +
                     b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    headers = {"Content-Type": f"multipart/form-data; boundary={boundary}"}
    if cookie:
        headers["Cookie"] = cookie
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    set_cookie = resp.getheader("Set-Cookie")
    conn.close()
    return resp.status, data, set_cookie


class TestPerUserFlows:
    """Per-user scoping through the UI (reference web/app/views.py user
    selection: datasets and checkpoints belong to the active user)."""

    def test_user_switch_scopes_datasets(self, server):
        port, state = server
        # create a second user and switch to it via the cookie flow
        st, _, _ = _post_cookie(port, "/create_user", {"username": "alice"})
        assert st in (200, 303)
        st, _, cookie = _post_cookie(port, "/set_user", {"user_id": 2})
        assert st == 303 and "user_id=2" in (cookie or "")
        csv_bytes = open(os.path.join(DATA, "regression.csv"), "rb").read()
        # alice uploads a dataset; default user uploads another
        _post_cookie(port, "/upload_data",
                     {"name": "alice_ds", "class": "regression",
                      "file": csv_bytes}, cookie="user_id=2")
        _post_cookie(port, "/upload_data",
                     {"name": "default_ds", "class": "regression",
                      "file": csv_bytes}, cookie="user_id=1")
        # each home view lists only the active user's datasets
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/", headers={"Cookie": "user_id=2"})
        body2 = conn.getresponse().read().decode()
        conn.request("GET", "/", headers={"Cookie": "user_id=1"})
        body1 = conn.getresponse().read().decode()
        conn.close()
        assert "alice_ds" in body2 and "default_ds" not in body2
        assert "default_ds" in body1 and "alice_ds" not in body1
        assert state.db.datasets(user_id=2)[0]["dataset_name"] == "alice_ds"

    def test_validate_smiles_endpoint(self, server):
        port, _ = server
        st, data, _ = _post_cookie(
            port, "/validate_smiles",
            {"smiles": "CCO\nnot_a_smiles((\nc1ccccc1"})
        assert st == 200
        out = json.loads(data)
        assert [o["valid"] for o in out] == [True, False, True]


class TestDepictEndpoint:
    def test_depict_svg_and_errors(self, server):
        port, _ = server
        import urllib.parse
        q = urllib.parse.quote("CC(=O)Oc1ccccc1C(=O)O")
        st, data = _get(port, f"/depict?smiles={q}&w=200&h=150")
        assert st == 200
        assert data.startswith(b"<svg")
        # polymer ensemble strings depict their monomer part
        q = urllib.parse.quote("[*:1]CC([*:2])C|1.0|<1-2:1.0:1.0")
        st, data = _get(port, f"/depict?smiles={q}")
        assert st == 200 and b"<svg" in data
        st, _ = _get(port, "/depict?smiles=bogus(((")
        assert st == 400


def _post_json(port, path, payload):
    body = json.dumps(payload).encode()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


class TestSketcher:
    """The drawing input modality (reference: bundled JSME editor): the
    canvas sketcher page + the /from_sketch graph->SMILES endpoint."""

    def test_sketch_to_smiles(self, server):
        port, _ = server
        # phenol drawn in kekule form: perception aromatizes it
        graph = {"atoms": [{"el": "C"}] * 6 + [{"el": "O"}],
                 "bonds": [{"a": 0, "b": 1, "order": 2},
                           {"a": 1, "b": 2, "order": 1},
                           {"a": 2, "b": 3, "order": 2},
                           {"a": 3, "b": 4, "order": 1},
                           {"a": 4, "b": 5, "order": 2},
                           {"a": 5, "b": 0, "order": 1},
                           {"a": 0, "b": 6, "order": 1}]}
        status, body = _post_json(port, "/from_sketch", graph)
        assert status == 200
        smi = json.loads(body)["smiles"]
        from polymer_chemprop_tpu.chem import parse_smiles
        mol = parse_smiles(smi)
        assert mol is not None and mol.n_atoms == 7
        assert sum(a.is_aromatic for a in mol.atoms) == 6

    def test_sketch_charged(self, server):
        port, _ = server
        graph = {"atoms": [{"el": "N", "charge": 1},
                           {"el": "O", "charge": -1},
                           {"el": "O"}, {"el": "C"}],
                 "bonds": [{"a": 0, "b": 1, "order": 1},
                           {"a": 0, "b": 2, "order": 2},
                           {"a": 0, "b": 3, "order": 1}]}
        status, body = _post_json(port, "/from_sketch", graph)
        assert status == 200 and b"[N+]" in body and b"[O-]" in body

    def test_sketch_errors(self, server):
        port, _ = server
        status, _ = _post_json(port, "/from_sketch",
                               {"atoms": [], "bonds": []})
        assert status == 400
        status, _ = _post_json(port, "/from_sketch",
                               {"atoms": [{"el": "Xx"}], "bonds": []})
        assert status == 400

    def test_sketcher_page(self, server):
        port, _ = server
        status, body = _get(port, "/sketcher")
        assert status == 200 and b"canvas" in body
        # ring-template toolbar (reference: JSME template buttons)
        assert b"armRing" in body and b"stampRing" in body
        assert b"aromatic" in body

    def test_template_stamped_benzene(self, server):
        """Exactly the graph the 6-ring template stamps with the aromatic
        toggle on (stampRing in the sketcher JS: alternating kekulized
        bond orders) must come back as benzene."""
        port, _ = server
        graph = {"atoms": [{"el": "C", "charge": 0}] * 6,
                 "bonds": [{"a": k, "b": (k + 1) % 6,
                            "order": 2 if k % 2 else 1}
                           for k in range(6)]}
        status, body = _post_json(port, "/from_sketch", graph)
        assert status == 200
        assert json.loads(body)["smiles"] == "c1ccccc1"

    def test_template_attached_ring(self, server):
        """Template stamped onto an existing atom: phenyl attached via a
        single bond (the sketcher's attach-at-atom branch)."""
        port, _ = server
        graph = {"atoms": [{"el": "C", "charge": 0}] * 7,
                 "bonds": [{"a": 1 + k, "b": 1 + (k + 1) % 6,
                            "order": 2 if k % 2 else 1}
                           for k in range(6)]
                 + [{"a": 0, "b": 1, "order": 1}]}
        status, body = _post_json(port, "/from_sketch", graph)
        assert status == 200
        from polymer_chemprop_tpu.chem import parse_smiles
        mol = parse_smiles(json.loads(body)["smiles"])
        assert mol.n_atoms == 7
        assert sum(a.is_aromatic for a in mol.atoms) == 6
