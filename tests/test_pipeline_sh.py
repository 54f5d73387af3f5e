"""Shell pipeline dry path: every stage (stub inference, dated log, mp3
conversion when ffmpeg exists, pluggable audio+SRT upload hooks) fires."""
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cron_command_dry_path():
    # absolute interpreter path + explicit PATH: the full suite has been seen
    # to reach this test with a clobbered inherited PATH (exec of 'bash'
    # failed ENOENT), and the script itself needs PATH for date/mkdir/ffmpeg
    env = dict(os.environ, PATH="/usr/local/bin:/usr/bin:/bin")
    out = subprocess.run(["/bin/bash", os.path.join(REPO, "pipelines", "test_cron_command.sh")],
                         capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 0, out.stderr
    assert "PIPELINE DRY PATH OK" in out.stdout
    for check in ("wav: ok", "srt: ok", "dated log: ok",
                  "audio upload stage: ok", "srt upload stage: ok"):
        assert check in out.stdout


def test_stock_digest_pipeline_per_ticker(tmp_path):
    """Per-ticker behavior (ref run_stock_digest_pipeline.sh:17-174): ticker
    filtering, MM_DD_YY date-pattern matching, UUID extraction, output
    matching, upload accounting — driven through the dry-run stub."""
    digests = tmp_path / "stock_digests"
    digests.mkdir()
    uu = "5711e948-e79d-414a-9ee3-b260953b2a17"
    # two tickers for the target date, one for another date, one short-id file
    (digests / f"AAPL_11_28_25_{uu}.txt").write_text("Speaker 1: apple news.")
    (digests / f"MSFT_11_28_25_{uu.replace('5711', 'abcd')}.txt").write_text(
        "Speaker 1: microsoft news.")
    (digests / f"GOOG_11_27_25_{uu.replace('5711', '1234')}.txt").write_text(
        "Speaker 1: google news.")
    (digests / "TSLA_11_28_25_deadbeef.txt").write_text("Speaker 1: tesla news.")
    outdir = tmp_path / "out"
    uploads = tmp_path / "uploads.log"
    up_cmd = tmp_path / "upload.sh"
    up_cmd.write_text("#!/bin/bash\necho \"UPLOAD $1 id=$2 key=$3\" >> %s\n" % uploads)
    up_cmd.chmod(0o755)

    env = dict(os.environ, PATH="/usr/local/bin:/usr/bin:/bin",
               PIPELINE_DRY_RUN="1", DIGESTS_DIR=str(digests),
               OUTPUT_DIR=str(outdir), LOG_DIR=str(tmp_path / "logs"),
               UPLOAD_AUDIO_CMD=str(up_cmd), UPLOAD_SRT_CMD=str(up_cmd))
    script = os.path.join(REPO, "pipelines", "run_stock_digest_pipeline.sh")

    # all tickers for the date: AAPL + MSFT + TSLA ride; GOOG (wrong date) not
    out = subprocess.run(["/bin/bash", script, "2025-11-28", "key", ""],
                         capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "Found 3 stock digest file(s)" in out.stdout
    assert "GOOG" not in out.stdout
    assert f"Digest ID: {uu}" in out.stdout
    assert "only short digest id found: deadbeef" in out.stdout
    assert "Successful: 3" in out.stdout and "Failed: 0" in out.stdout
    ups = uploads.read_text()
    # audio (wav in dry-run, no ffmpeg assumption) + srt per file, right ids
    assert ups.count(f"id={uu}") == 2 and ups.count("id=deadbeef") == 2

    # ticker filter: only AAPL,MSFT ride
    uploads.write_text("")
    out = subprocess.run(["/bin/bash", script, "2025-11-28", "key", "", "AAPL,MSFT"],
                         capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "Found 2 stock digest file(s)" in out.stdout
    assert "TSLA" not in out.stdout.split("Step 2.1")[0].split("Found 2")[1]
    assert "Successful: 2" in out.stdout

    # no files for the date -> hard error (ref :79-106)
    out = subprocess.run(["/bin/bash", script, "2030-01-01", "key", ""],
                         capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 1
    assert "No stock digest files found for date 2030-01-01" in out.stdout


def test_setup_cron_entries_match_reference_schedule():
    src = open(os.path.join(REPO, "pipelines", "setup_cron.sh")).read()
    assert "35 12 * * 1-5" in src  # weekday morning
    assert "35 21 * * 1-5" in src  # weekday evening
    assert "35 21 * * 6" in src    # weekly saturday
    assert "35 21 * * 0" in src    # weekly sunday
    assert "0 13 * * *" in src     # daily stock digest
    for log in ("morning_", "evening_", "weekly_saturday_", "weekly_sunday_",
                "stock_digest_"):
        assert log in src  # dated per-run logs
