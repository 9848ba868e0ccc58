"""Batched long-form AMT inference — the north-star throughput path.

The reference evaluates one 5 s utterance at a time in song order
(``MIR_ST500/train_audio_ssl.py:84-141``, batch_size=1 asserted), pulling
logits to the CPU per chunk. That leaves the accelerator idle most of the
time. Here the redesign is TPU-first (SURVEY.md §5.7):

- songs are chunked host-side into fixed-length windows (static shapes);
- chunks from *all* songs are batched together and streamed through one
  jit-compiled program: encoder → head → sigmoid/argmax compaction packed
  into ONE (B, F, 4) array on device, so a single small transfer comes back
  over the host link per batch (not raw logits, not four separate arrays —
  per-transfer latency through a relayed link is as expensive as bytes);
- host→device feeds are staged by a prefetch thread so the next batch
  uploads while the device computes and the main thread stitches;
- a host ring of per-song buffers stitches chunk outputs back in order and
  runs the ``frame2note`` decoder + scoring off the critical path.

Quality matches the chunked reference exactly: each chunk passes through the
same conv frontend independently, so stitched frame sequences are identical
to the reference's per-utterance loop.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.utils.amt import frame2note, frame2note_fast


class BatchedAMTTranscriber:
    """Chunk-batched singing transcription over a single device or a mesh.

    Arguments
    ---------
    bridge : models.wav2vec2.HuggingFaceWav2Vec2
        The SSL encoder bridge (with its normalization semantics).
    head : nnet.linear.Linear
        Frame head producing 2 + (octaves+1) + (classes+1) logits.
    params : dict
        ``{"wav2vec2": ..., "model": ...}`` parameter pytrees.
    chunk_seconds : float
        Window length (the reference's ``dur_threshold`` = 5 s).
    batch_size : int
        Chunks per device batch — the throughput lever.
    compute_dtype : jnp dtype
        bf16 by default: wav2vec2 inference is robust to bf16 matmuls and the
        MXU runs them at full rate.
    compact : str
        Device→host output packing. ``"f32"`` (default) returns exact float32
        probabilities/indices; ``"u16"`` quantizes the two probabilities to
        uint16 (error ≤ 1/131070 — far below the 0.4/0.5 decision thresholds)
        halving the bytes per transfer for bandwidth-starved host links.
    """

    def __init__(self, bridge, head, params, chunk_seconds=5.0, batch_size=32,
                 sample_rate=16000, frame_rate=49.8, pitch_octave_num=4,
                 pitch_class_num=12, onset_threshold=0.4, offset_threshold=0.5,
                 compute_dtype=jnp.bfloat16, mesh=None, chunking="ceil",
                 compact="f32", song_bucket_seconds=30.0):
        self.bridge = bridge
        self.head = head
        self.chunk_samples = int(round(chunk_seconds * sample_rate))
        self.batch_size = batch_size
        self.sample_rate = sample_rate
        self.frame_rate = frame_rate
        self.pitch_octave_num = pitch_octave_num
        self.pitch_class_num = pitch_class_num
        self.onset_threshold = onset_threshold
        self.offset_threshold = offset_threshold
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.chunk_frames = bridge.config.output_length(self.chunk_samples)
        # "ceil": equal windows, last zero-padded (max throughput).
        # "reference": the reference's utterance split (utter_num =
        # round(dur/cs), last chunk up to 1.5x cs). Last chunks are padded to
        # the SAME 1 s shape buckets the recipe loaders use, so the padded
        # attention context is identical and the frame streams match the
        # recipes' batch-1 eval bit for bit; each bucket runs in its own
        # batches (a handful of extra compiled shapes).
        # "song": ONE window per song (padded to `song_bucket_seconds`
        # buckets) — every frame attends over the ENTIRE song. The reference
        # chunks because full songs don't fit GPU attention
        # (SURVEY.md §5.7); the lengths-masked Pallas flash kernel streams
        # K/V panels, so whole-song windows (3-5 min ≈ 9-15k frames) run in
        # VMEM-bounded memory on TPU. Use a small batch_size here.
        if chunking not in ("ceil", "reference", "song"):
            raise ValueError(chunking)
        self.chunking = chunking
        self.pad_bucket = sample_rate  # 1 s buckets, like pad_multiples[sig]
        self.song_bucket = int(round(song_bucket_seconds * sample_rate))
        if compact not in ("f32", "u16"):
            raise ValueError(compact)
        self.compact = compact

        if compute_dtype == jnp.bfloat16:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
        if mesh is not None:
            from svt_speechbrain_tpu.parallel import mesh as mesh_lib

            params = mesh_lib.replicate(mesh, params)
        self.params = jax.device_put(params) if mesh is None else params

        octave_num = pitch_octave_num

        def forward(params, wavs, wav_lens):
            # int16 PCM feed: half the PCIe/host-link bytes of f32; source
            # audio is 16-bit PCM so this is lossless end-to-end
            if wavs.dtype == jnp.int16:
                wavs = wavs.astype(compute_dtype) * (1.0 / 32768.0)
            wavs = wavs.astype(compute_dtype)
            # exact-lengths masking: outputs are independent of the padding
            # bucket and equal to unpadded per-utterance inference
            feats = self.bridge(params["wav2vec2"], wavs, wav_lens=wav_lens)
            logits = self.head(params["model"], feats).astype(jnp.float32)
            onset_prob = jax.nn.sigmoid(logits[:, :, 0])
            offset_prob = jax.nn.sigmoid(logits[:, :, 1])
            octave_idx = jnp.argmax(logits[:, :, 2:3 + octave_num], axis=-1)
            class_idx = jnp.argmax(logits[:, :, 3 + octave_num:], axis=-1)
            # ONE packed array back to the host: through a relayed/tunneled
            # link each separate device→host transfer pays a fixed RPC
            # latency, so four small arrays cost ~4x one
            if compact == "u16":
                return jnp.stack(
                    [jnp.round(onset_prob * 65535.0),
                     jnp.round(offset_prob * 65535.0),
                     octave_idx.astype(jnp.float32),
                     class_idx.astype(jnp.float32)], axis=-1).astype(jnp.uint16)
            return jnp.stack(
                [onset_prob, offset_prob, octave_idx.astype(jnp.float32),
                 class_idx.astype(jnp.float32)], axis=-1)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._forward = jax.jit(
                forward,
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P("data", None)),
                              NamedSharding(mesh, P("data"))),
                out_shardings=NamedSharding(mesh, P("data", None, None)))
        else:
            self._forward = jax.jit(forward)

    # ------------------------------------------------------------ chunking
    def _chunk_song(self, wav):
        """Split one waveform into fixed windows; last window zero-padded.
        Returns (chunks list of (S,)|(1.5S,) arrays, true_frames list,
        is_long list). int16 input is kept as int16 (converted on device —
        fewer host-link bytes)."""
        n = len(wav)
        cs = self.chunk_samples
        dtype = np.int16 if wav.dtype == np.int16 else np.float32
        if self.chunking == "song":
            width = int(max(1, -(-n // self.song_bucket)) * self.song_bucket)
            buf = np.zeros(width, dtype=dtype)
            buf[:n] = wav
            return ([buf], [self.bridge.config.output_length(n)], [width], [n])
        if self.chunking == "reference":
            n_chunks = max(1, round(n / cs))
        else:
            n_chunks = max(1, -(-n // cs))
        chunks, frames, widths, true_lens = [], [], [], []
        for i in range(n_chunks):
            if i == n_chunks - 1 and self.chunking == "reference":
                part = wav[i * cs:]
            else:
                part = wav[i * cs:(i + 1) * cs]
            if len(part) == cs:
                width = cs
            elif self.chunking == "reference":
                width = int(-(-len(part) // self.pad_bucket) * self.pad_bucket)
            else:  # ceil mode: zero-pad the short tail to the common window
                width = cs
            buf = np.zeros(width, dtype=dtype)
            buf[:len(part)] = part
            chunks.append(buf)
            frames.append(self.bridge.config.output_length(len(part)))
            widths.append(width)
            true_lens.append(len(part))
        return chunks, frames, widths, true_lens

    def predict_frames(self, songs, depth=2):
        """songs: dict name → waveform (np.float32 at 16 kHz).

        Returns dict name → (frames, 4) float32 array of
        ``[onset_prob, offset_prob, octave_idx, class_idx]`` rows, stitched in
        chunk order with padding frames trimmed. Everything stays in numpy —
        no per-frame python objects (the reference's per-frame loop,
        ``train_audio_ssl.py:95-100``, was its eval hot spot).

        ``depth`` batches are kept in flight: a prefetch thread stages the
        host→device uploads, the main thread dispatches device batches, and
        a drainer thread blocks on the device→host downloads and stitches —
        upload, compute, download, and stitch all overlap, so the device
        only waits when a link direction is genuinely saturated.
        """
        import queue as queue_mod
        import threading
        from concurrent.futures import ThreadPoolExecutor

        by_width = {}  # width → (order list, chunk list, rel-length list)
        for name, wav in songs.items():
            wav = np.asarray(wav)
            if wav.dtype != np.int16:
                wav = wav.astype(np.float32)
            chunks, frames, widths, true_lens = self._chunk_song(wav)
            for i in range(len(chunks)):
                order_list, chunk_list, len_list = by_width.setdefault(
                    widths[i], ([], [], []))
                order_list.append((name, i, frames[i]))
                chunk_list.append(chunks[i])
                len_list.append(true_lens[i] / widths[i])

        b = self.batch_size
        jobs = []  # (width, batch chunk list, lens list, order_list, bi, real)
        for width, (order_list, chunk_list, len_list) in sorted(
                by_width.items(), key=lambda kv: -len(kv[1][1])):
            n_batches = -(-len(chunk_list) // b)
            for bi in range(n_batches):
                batch = chunk_list[bi * b:(bi + 1) * b]
                lens = len_list[bi * b:(bi + 1) * b]
                real = len(batch)
                if real < b:
                    batch = batch + [np.zeros(width, batch[0].dtype)] * (b - real)
                    lens = lens + [0.0] * (b - real)
                jobs.append((batch, lens, order_list, bi, real))

        def stage(job):
            batch, lens, *_ = job
            return (jnp.asarray(np.stack(batch)),
                    jnp.asarray(lens, jnp.float32))

        results = {name: {} for name in songs}
        out_q = queue_mod.Queue(maxsize=max(depth, 1))
        drain_errors = []

        def drainer():
            # catches BaseException (e.g. a KeyboardInterrupt delivered
            # inside np.asarray): a silently-dead drainer would leave the
            # producer's bounded put blocked forever
            while True:
                item = out_q.get()
                if item is None:
                    return
                try:
                    self._drain(item, results, b)
                except BaseException as exc:  # surfaced after join
                    drain_errors.append(exc)

        def put_guarded(item):
            # bounded-queue put that can't hang on a dead drainer
            while True:
                try:
                    out_q.put(item, timeout=5.0)
                    return
                except queue_mod.Full:
                    if not drain_thread.is_alive():
                        raise RuntimeError("drainer thread died") from (
                            drain_errors[0] if drain_errors else None)

        executor = ThreadPoolExecutor(max_workers=1)
        drain_thread = threading.Thread(target=drainer, daemon=True)
        drain_thread.start()
        try:
            staged = [executor.submit(stage, j) for j in jobs[:depth + 1]]
            next_stage = len(staged)
            for idx, (batch, lens, order_list, bi, real) in enumerate(jobs):
                wavs_dev, lens_dev = staged[idx].result()
                staged[idx] = None  # free the staged handle
                if next_stage < len(jobs):
                    staged.append(executor.submit(stage, jobs[next_stage]))
                    next_stage += 1
                device_out = self._forward(self.params, wavs_dev, lens_dev)
                # blocks only when `depth` outputs are already waiting on the
                # downlink — backpressure, not a sync point
                put_guarded((bi, real, device_out, order_list))
        finally:
            if drain_thread.is_alive():
                try:
                    put_guarded(None)
                except RuntimeError:
                    pass
            # wait for the drainer to finish — it always terminates (exits on
            # the None sentinel, and a died drainer is no longer alive). A
            # SLOW drainer (e.g. a degraded device→host link) must be waited
            # out, not abandoned: a timed-out join here would silently stitch
            # incomplete results.
            drain_thread.join()
            executor.shutdown(wait=True)
        if drain_errors:
            raise drain_errors[0]

        stitched = {}
        for name in songs:
            per_chunk = results[name]
            stitched[name] = np.concatenate(
                [per_chunk[i] for i in range(len(per_chunk))], axis=0)
        return stitched

    def _drain(self, item, results, b):
        bi, real, device_out, order = item
        packed = np.asarray(device_out)  # (B, F, 4) — the one d2h per batch
        if packed.dtype == np.uint16:
            stacked = packed.astype(np.float32)
            stacked[:, :, :2] *= 1.0 / 65535.0
        else:
            stacked = packed
        for j in range(real):
            name, chunk_idx, frames = order[bi * b + j]
            results[name][chunk_idx] = stacked[j, :frames]

    def transcribe(self, songs, fast=True):
        """dict name → waveform ⇒ dict name → [[onset_s, offset_s, midi], ...].

        ``fast=True`` uses the vectorized decoder, ``fast=False`` the
        reference state machine — both produce bit-identical notes
        (equivalence-tested including majority-vote ties).

        Example
        -------
        >>> import jax, numpy as np, jax.numpy as jnp
        >>> from svt_speechbrain_tpu.models.wav2vec2 import (
        ...     HuggingFaceWav2Vec2, Wav2Vec2Config)
        >>> from svt_speechbrain_tpu.nnet.linear import Linear
        >>> cfg = Wav2Vec2Config(hidden_size=16, num_layers=1, num_heads=4,
        ...                      ffn_size=32, conv_dim=(8,) * 7,
        ...                      num_conv_pos_embeddings=16,
        ...                      num_conv_pos_embedding_groups=4)
        >>> bridge = HuggingFaceWav2Vec2(config=cfg)
        >>> head = Linear(2 + 5 + 13, 16)       # onset/offset + octave/class
        >>> params = {"wav2vec2": bridge.init(jax.random.PRNGKey(0)),
        ...           "model": head.init(jax.random.PRNGKey(1))}
        >>> tr = BatchedAMTTranscriber(bridge, head, params,
        ...                            chunk_seconds=1.0, batch_size=2,
        ...                            compute_dtype=jnp.float32)
        >>> notes = tr.transcribe({"song1": np.zeros(24000, np.float32)})
        >>> sorted(notes), all(len(ev) == 3 for ev in notes["song1"])
        (['song1'], True)
        """
        decode = frame2note_fast if fast else frame2note
        frames = self.predict_frames(songs)
        return {
            name: decode(fi, onset_thres=self.onset_threshold,
                         offset_thres=self.offset_threshold,
                         frame_size=1 / self.frame_rate)
            for name, fi in frames.items()
        }


def _append_pcm(buffer, samples):
    """Append a 1-D PCM piece to a (possibly empty) buffered partial window.

    Rejects a dtype switch mid-window: concatenating int16 PCM into a float
    window (or vice versa) would silently promote and skip the device-side
    1/32768 scaling, making the int16-origin samples ~32768x too loud.
    Shared by :class:`StreamSession` and :class:`StreamingAMTTranscriber`.
    """
    samples = np.asarray(samples)
    if samples.ndim != 1:
        raise ValueError("feed() takes a 1-D sample array")
    if not len(samples):
        # empty feeds are no-ops — concatenating an empty float array
        # would silently promote a buffered int16 window
        return samples if buffer is None else buffer
    if buffer is None or not len(buffer):
        return samples
    if samples.dtype != buffer.dtype:
        raise ValueError(f"dtype switch mid-window: buffered "
                         f"{buffer.dtype}, fed {samples.dtype}")
    return np.concatenate([buffer, samples])


class StreamSession:
    """One live stream inside a :class:`StreamingServer` (create via
    ``server.open()``, never directly). ``feed()`` PCM as it arrives; notes
    are finalized whenever the server runs a batch and are handed back —
    exactly once — through this session's ``feed()``/``poll()``/``flush()``.

    Example
    -------
    >>> import jax, numpy as np, jax.numpy as jnp
    >>> from svt_speechbrain_tpu.models.wav2vec2 import (
    ...     HuggingFaceWav2Vec2, Wav2Vec2Config)
    >>> from svt_speechbrain_tpu.nnet.linear import Linear
    >>> cfg = Wav2Vec2Config(hidden_size=16, num_layers=1, num_heads=4,
    ...                      ffn_size=32, conv_dim=(8,) * 7,
    ...                      num_conv_pos_embeddings=16,
    ...                      num_conv_pos_embedding_groups=4)
    >>> bridge = HuggingFaceWav2Vec2(config=cfg)
    >>> head = Linear(2 + 5 + 13, 16)
    >>> params = {"wav2vec2": bridge.init(jax.random.PRNGKey(0)),
    ...           "model": head.init(jax.random.PRNGKey(1))}
    >>> server = StreamingServer(bridge, head, params, batch_size=2,
    ...                          chunk_seconds=0.5,
    ...                          compute_dtype=jnp.float32)
    >>> a, b = server.open("alice"), server.open("bob")
    >>> _ = a.feed(np.zeros(12000, np.float32))   # buffers + auto-pumps
    >>> _ = b.feed(np.zeros(5000, np.float32))
    >>> notes_a, notes_b = a.flush(), b.flush()   # forces a final pump
    >>> all(len(ev) == 3 for ev in notes_a + notes_b)
    True
    """

    def __init__(self, server, name, decoder):
        self._server = server
        self.name = name
        self._decoder = decoder
        self._buffer = None
        self._done = False
        self._notes = []  # finalized, not yet handed to the caller

    def _take(self):
        out, self._notes = self._notes, []
        return out

    def feed(self, samples):
        """Append PCM samples (float32 or int16, (T,)). Full windows are
        queued on the server; whenever a whole batch is ready the server
        auto-pumps. Returns the notes finalized for THIS session so far."""
        if self._done:
            raise RuntimeError("stream already flushed")
        self._buffer = _append_pcm(self._buffer, samples)
        cs = self._server._tr.chunk_samples
        while len(self._buffer) >= cs:
            self._server._enqueue(self, self._buffer[:cs], cs)
            self._buffer = self._buffer[cs:]
        self._server._auto_pump()
        return self._take()

    def poll(self):
        """Notes finalized for this session since the last hand-off (e.g. by
        another session's auto-pump or an explicit ``server.pump()``)."""
        return self._take()

    def flush(self):
        """End this stream: queue the final partial window (zero-padded with
        exact-lengths masking), force a server pump, and close any open
        note. Idempotent; returns the remaining notes."""
        if self._done:
            return []
        self._done = True
        if self._buffer is not None and len(self._buffer):
            tail = np.zeros(self._server._tr.chunk_samples,
                            self._buffer.dtype)
            tail[:len(self._buffer)] = self._buffer
            self._server._enqueue(self, tail, len(self._buffer))
        self._buffer = None
        self._server.pump()
        self._server._n_open -= 1
        return self._take() + self._decoder.flush()


class StreamingServer:
    """Multiplexed low-latency serving: N concurrent PCM streams share ONE
    jit-compiled batched chunk program.

    :class:`StreamingAMTTranscriber` gives a single stream one-chunk latency
    but runs the device at batch 1; a realtime service with many callers
    would leave the MXU mostly idle. This server multiplexes instead — a
    capability beyond the reference, whose eval is offline batch-1 by
    construction (``MIR_ST500/train_audio_ssl.py:84-141``):

    - each :meth:`open` returns a :class:`StreamSession` with its own buffer
      and :class:`~svt_speechbrain_tpu.utils.amt.IncrementalFrame2Note`
      decoder;
    - full windows from ALL sessions queue up FIFO; as soon as
      ``batch_size`` of them are ready the server auto-runs one batched
      forward (rows it can't fill are masked out by the same ``valid``
      relative-lengths mechanism the offline path uses, so short batches
      stay exact);
    - :meth:`pump` forces the queue through (partial final batch included) —
      call it on a latency deadline; ``flush()`` of any session calls it.

    Per-session emitted notes are exactly what a dedicated streaming
    transcriber produces for the same audio (tested): rows of a batch are
    numerically independent, so multiplexing costs no accuracy. Works with
    ``quantize``-transformed (int8) params like every other serving path.

    Drive one server from one thread (a network frontend should funnel
    caller PCM through a queue); sessions share the server's run state, so
    concurrent ``feed()`` calls need external locking.
    """

    def __init__(self, bridge, head, params, batch_size=8, chunk_seconds=5.0,
                 sample_rate=16000, frame_rate=49.8, onset_threshold=0.4,
                 offset_threshold=0.5, **kwargs):
        from svt_speechbrain_tpu.utils.amt import IncrementalFrame2Note

        self._tr = BatchedAMTTranscriber(
            bridge, head, params, chunk_seconds=chunk_seconds,
            batch_size=batch_size, sample_rate=sample_rate,
            frame_rate=frame_rate, onset_threshold=onset_threshold,
            offset_threshold=offset_threshold, chunking="ceil", **kwargs)
        self._decoder_args = (onset_threshold, offset_threshold,
                              1.0 / frame_rate)
        self._make_decoder = IncrementalFrame2Note
        self._queue = []  # FIFO of (session, (cs,) window, true_samples)
        self._n_open = 0
        self._n_sessions = 0

    @property
    def pending(self):
        """Windows queued but not yet run."""
        return len(self._queue)

    @property
    def open_sessions(self):
        """Sessions opened and not yet flushed."""
        return self._n_open

    def open(self, name=None):
        """Start a new stream; ``name`` defaults to ``"stream<N>"``."""
        on, off, fs = self._decoder_args
        if name is None:
            name = f"stream{self._n_sessions}"
        self._n_sessions += 1
        self._n_open += 1
        return StreamSession(self, name,
                             self._make_decoder(on, off, frame_size=fs))

    def _enqueue(self, session, window, true_samples):
        self._queue.append((session, window, true_samples))

    def _auto_pump(self):
        b = self._tr.batch_size
        while len(self._queue) >= b:
            self._run_batch(self._queue[:b])
            del self._queue[:b]

    def pump(self):
        """Run every queued window now (the final batch may be partial —
        masked rows, same numerics). Returns the number of windows run;
        finalized notes land in their sessions (``poll()`` them)."""
        n = len(self._queue)
        b = self._tr.batch_size
        while self._queue:
            take = self._queue[:b]
            del self._queue[:len(take)]
            self._run_batch(take)
        return n

    def _run_batch(self, entries):
        tr = self._tr
        cs = tr.chunk_samples
        rows, lens = [], []
        # int16 rows ride the host link as int16 only when the whole batch
        # is int16 (the device program scales by 1/32768 on dtype); mixed
        # batches fall back to a lossless host-side float32 conversion
        all_i16 = all(e[1].dtype == np.int16 for e in entries)
        for _, window, true_samples in entries:
            if not all_i16 and window.dtype == np.int16:
                window = window.astype(np.float32) * (1.0 / 32768.0)
            rows.append(window)
            lens.append(true_samples / cs)
        pad_dtype = np.int16 if all_i16 else np.float32
        while len(rows) < tr.batch_size:
            rows.append(np.zeros(cs, pad_dtype))
            lens.append(0.0)
        packed = tr._forward(tr.params, jnp.asarray(np.stack(rows)),
                             jnp.asarray(lens, jnp.float32))
        out = np.asarray(packed)  # the ONE d2h transfer for this batch
        if out.dtype == np.uint16:  # compact="u16"
            out = out.astype(np.float32)
            out[:, :, :2] *= 1.0 / 65535.0
        for j, (session, _, true_samples) in enumerate(entries):
            f = tr.bridge.config.output_length(true_samples)
            session._notes += session._decoder.feed(out[j, :f])


class StreamingAMTTranscriber:
    """Low-latency streaming transcription: ``feed()`` PCM as it arrives and
    receive note events as soon as they are final; ``flush()`` at stream end.

    A capability beyond the reference (which is offline-only,
    ``train_audio_ssl.py:84-141``): the same jitted chunk program as
    :class:`BatchedAMTTranscriber` runs every time a full window of samples
    has accumulated, and an :class:`~svt_speechbrain_tpu.utils.amt.
    IncrementalFrame2Note` decoder finalizes notes with bounded lookahead.
    The complete emitted stream is exactly what the offline transcriber's
    exact decode produces for the same audio (tested), so streaming costs no
    accuracy. End-to-end latency is one chunk (default 5 s) plus the
    decoder's 4-frame (~80 ms) peak lookahead.
    """

    def __init__(self, bridge, head, params, chunk_seconds=5.0,
                 sample_rate=16000, frame_rate=49.8, onset_threshold=0.4,
                 offset_threshold=0.5, **kwargs):
        from svt_speechbrain_tpu.utils.amt import IncrementalFrame2Note

        self._tr = BatchedAMTTranscriber(
            bridge, head, params, chunk_seconds=chunk_seconds, batch_size=1,
            sample_rate=sample_rate, frame_rate=frame_rate,
            onset_threshold=onset_threshold, offset_threshold=offset_threshold,
            chunking="ceil", **kwargs)
        self._decoder = IncrementalFrame2Note(
            onset_threshold, offset_threshold, frame_size=1.0 / frame_rate)
        self._buffer = None
        self._done = False

    def _run_chunk(self, chunk, true_samples):
        tr = self._tr
        rel = np.float32(true_samples / len(chunk))
        packed = tr._forward(tr.params, jnp.asarray(chunk)[None],
                             jnp.asarray([rel], jnp.float32))
        f = tr.bridge.config.output_length(true_samples)
        rows = np.asarray(packed)[0, :f]  # (f, 4)
        if rows.dtype == np.uint16:  # compact="u16" passed through kwargs
            rows = rows.astype(np.float32)
            rows[:, :2] *= 1.0 / 65535.0
        return self._decoder.feed(rows)

    def feed(self, samples):
        """Append PCM samples (float32 or int16, (T,)); returns the notes
        finalized by this piece as ``[[onset_s, offset_s, midi], ...]``."""
        if self._done:
            raise RuntimeError("stream already flushed")
        self._buffer = _append_pcm(self._buffer, samples)
        notes = []
        cs = self._tr.chunk_samples
        while len(self._buffer) >= cs:
            notes += self._run_chunk(self._buffer[:cs], cs)
            self._buffer = self._buffer[cs:]
        return notes

    def flush(self):
        """End the stream: decode the final partial window (zero-padded with
        exact-lengths masking, like the offline ceil chunker) and close any
        open note."""
        if self._done:
            return []
        self._done = True
        notes = []
        if self._buffer is not None and len(self._buffer):
            tail = np.zeros(self._tr.chunk_samples, self._buffer.dtype)
            tail[:len(self._buffer)] = self._buffer
            notes += self._run_chunk(tail, len(self._buffer))
        self._buffer = None
        return notes + self._decoder.flush()
