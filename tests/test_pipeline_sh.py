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
