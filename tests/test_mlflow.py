"""MLflow client/recorder against a mock in-process REST server
(≙ the MLflow client unit test, border-mlflow-tracking/src/client.rs)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from border_tpu.record import MlflowClient, MlflowRecorder, Record
from border_tpu.record.mlflow import MlflowError


class _Handler(BaseHTTPRequestHandler):
    store = {"experiments": {}, "runs": {}, "metrics": [], "params": [],
             "tags": [], "terminated": []}

    def log_message(self, *a):
        pass

    def _json(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if "experiments/get-by-name" in self.path:
            name = self.path.split("experiment_name=")[1]
            if name in self.store["experiments"]:
                self._json(200, {"experiment": {"experiment_id": self.store["experiments"][name]}})
            else:
                self._json(404, {"error_code": "RESOURCE_DOES_NOT_EXIST"})
        else:
            self._json(404, {})

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        if self.path.endswith("experiments/create"):
            eid = str(len(self.store["experiments"]) + 1)
            self.store["experiments"][body["name"]] = eid
            self._json(200, {"experiment_id": eid})
        elif self.path.endswith("runs/create"):
            rid = f"run{len(self.store['runs']) + 1}"
            self.store["runs"][rid] = body
            self._json(200, {"run": {"info": {"run_id": rid}}})
        elif self.path.endswith("runs/log-metric"):
            self.store["metrics"].append(body)
            self._json(200, {})
        elif self.path.endswith("runs/log-parameter"):
            self.store["params"].append(body)
            self._json(200, {})
        elif self.path.endswith("runs/set-tag"):
            self.store["tags"].append(body)
            self._json(200, {})
        elif self.path.endswith("runs/update"):
            self.store["terminated"].append(body)
            self._json(200, {})
        else:
            self._json(404, {})


@pytest.fixture()
def mlflow_server():
    _Handler.store = {"experiments": {}, "runs": {}, "metrics": [],
                      "params": [], "tags": [], "terminated": []}
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _Handler.store
    srv.shutdown()


def test_client_experiment_and_run_lifecycle(mlflow_server):
    uri, store = mlflow_server
    client = MlflowClient(uri)
    eid = client.get_or_create_experiment("exp1")
    assert eid == client.get_or_create_experiment("exp1")  # idempotent
    rid = client.create_run(eid, "run-name")
    client.log_metric(rid, "loss", 0.5, step=10)
    client.log_param(rid, "lr", 1e-3)
    client.terminate_run(rid)
    assert store["metrics"][0]["key"] == "loss"
    assert store["params"][0]["value"] == "0.001"
    assert store["terminated"][0]["status"] == "FINISHED"


def test_recorder_write_flush_close(mlflow_server):
    uri, store = mlflow_server
    client = MlflowClient(uri)
    rec = MlflowRecorder(client, "exp2", "r1", params={"gamma": 0.99})
    rec.store(Record({"loss": 1.0}))
    rec.store(Record({"loss": 3.0}))
    rec.flush(step=5)  # aggregated loss_mean etc. logged as metrics
    rec.write_at(Record({"Episode return": 100.0, "note": "str-skipped"}), 7)
    rec.close()
    keys = [m["key"] for m in store["metrics"]]
    assert "loss_mean" in keys and "Episode return" in keys
    assert "note" not in keys
    assert store["params"][0]["key"] == "gamma"
    assert store["terminated"]


def test_client_error_on_unreachable():
    client = MlflowClient("http://127.0.0.1:9", timeout=0.2)
    with pytest.raises(MlflowError):
        client.create_run("0")
