"""Command-line daemons mirroring the reference binaries.

radio    — core receiver: I/Q multicast in, PCM multicast out (main.c/radio.c)
bankd    — multichannel bank daemon: wideband I/Q in, N PCM streams out
iqplay   — replay recordings/stdin as an RTP I/Q stream (iqplay.c)
iqrecord — record RTP sessions to files with xattr metadata (iqrecord.c)
modulate — baseband audio -> modulated I/Q test signal (modulate.c)
pcmcat   — PCM RTP stream -> raw s16 on stdout (pcmcat.c)
pcmsend  — raw s16 on stdin -> PCM RTP stream (pcmsend.c, stdin for portaudio)
monitor  — multi-stream RTP audio player/mixer -> stdout (monitor.c)
control  — TLV status stream dashboard / remote control (control.c)
packetd  — AFSK/AX.25 demodulator daemon (packet.c)
aprsfeed — APRS i-gate: AX.25 -> APRS-IS (aprsfeed.c)

Each is runnable as `python -m ka9q_sdr_tpu.apps.<name>`.
"""
