"""gunicorn deploy config (alternative to deploy/uwsgi.ini).

    TMV_CLASSES_FILE=... TMV_ANCHORS_FILE=... TMV_MODEL_PATH=... \
        gunicorn -c deploy/gunicorn.conf.py tmv_tpu.serving.wsgi:application

One worker per TPU-attached process (the warm jitted predictor lives in
the worker); threads handle concurrent requests against the same
predictor — JAX dispatch is thread-safe.  max_requests mirrors the
reference uwsgi.ini's 5000-request worker recycling.
"""

bind = "127.0.0.1:8001"
workers = 1
threads = 4
max_requests = 5000
timeout = 120  # first request pays model compile
preload_app = False  # each worker builds its own device context
