/* Stub ncurses.h — status.c includes it but the codec functions we compile
 * never touch curses.  Present only so the reference TU parses. */
#ifndef KA9Q_SHIM_NCURSES_H
#define KA9Q_SHIM_NCURSES_H 1
#endif
